"""Event pipeline / safe mode.

Parity: /root/reference/lib/events.js. Warning events accumulate in
``options['events']``; safe mode rejects exactly the enumerated unsafe
codes (lib/events.js:103-129) and ignores any other event levels/codes.
"""

from __future__ import annotations

from .errors import JsonLdError

NOT_SAFE_EVENT_CODES = frozenset({
    "empty object",
    "free-floating scalar",
    "invalid @language value",
    "invalid property",
    "null @id value",
    "null @value value",
    "object with only @id",
    "object with only @language",
    "object with only @list",
    "object with only @value",
    "relative @id reference",
    "relative @type reference",
    "relative @vocab reference",
    "reserved @id value",
    "reserved @reverse value",
    "reserved term",
    "blank node predicate",
    "relative graph reference",
    "relative object reference",
    "relative predicate reference",
    "relative subject reference",
    "rdfDirection not set",
})


def emit(options: dict, code: str, message: str, level: str = "warning",
         **details) -> None:
    """Record an event; under safe mode, raise for unsafe codes only."""
    events = options.setdefault("events", []) if isinstance(options, dict) else []
    events.append({"code": code, "level": level, "message": message,
                   "details": details})
    if isinstance(options, dict) and options.get("safe") \
            and level == "warning" and code in NOT_SAFE_EVENT_CODES:
        raise JsonLdError("Safe mode validation error.",
                          "jsonld.ValidationError", code=code,
                          details={"event": {"code": code, "message": message}})
