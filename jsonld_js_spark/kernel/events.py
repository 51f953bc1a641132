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


_DEFAULT_HANDLER = [None]


def safe_event_handler(*, event, next):
    """Rejects unsafe warning conditions (lib/events.js:132-143)."""
    if event["level"] == "warning" and event["code"] in NOT_SAFE_EVENT_CODES:
        raise JsonLdError("Safe mode validation error.",
                          "jsonld.ValidationError", code=event["code"],
                          details={"event": {"code": event["code"],
                                             "message": event["message"]}})
    next()


def log_event_handler(*, event, next):
    """Logs all events and continues (lib/events.js:145-148)."""
    print(f"EVENT: {event['message']}", event)
    next()


def log_warning_event_handler(*, event, next):
    """Logs warning-level events and continues (lib/events.js:151-156)."""
    import sys

    if event["level"] == "warning":
        print(f"WARNING: {event['message']}", event, file=sys.stderr)
    next()


def unhandled_event_handler(*, event, next=None):
    """Throws for any event that reaches it (lib/events.js:159-165)."""
    raise JsonLdError("No handler for event.", "jsonld.UnhandledEvent",
                      details={"event": event})


def set_default_event_handler(event_handler=None) -> None:
    """Install a process-wide default handler used when a call does
    not pass ``eventHandler`` (lib/events.js:178-180)."""
    _DEFAULT_HANDLER[0] = event_handler


def _handle(event: dict, handlers) -> bool:
    """Walk a handler chain with the reference's continuation protocol
    (lib/events.js:74-101): a handler runs the next one only by
    calling ``next``; lists splice; dicts dispatch by event code."""
    do_next = True
    for handler in (handlers if isinstance(handlers, list) else [handlers]):
        if not do_next:
            break
        do_next = False
        if isinstance(handler, list):
            do_next = _handle(event, handler)
        elif callable(handler):
            hit = []
            handler(event=event, next=lambda: hit.append(True))
            do_next = bool(hit)
        elif isinstance(handler, dict):
            if event["code"] in handler:
                hit = []
                handler[event["code"]](event=event,
                                       next=lambda: hit.append(True))
                do_next = bool(hit)
            else:
                do_next = True
        else:
            raise JsonLdError("Invalid event handler.",
                              "jsonld.InvalidEventHandler",
                              details={"event": event})
    return do_next


def emit(options: dict, code: str, message: str, level: str = "warning",
         **details) -> None:
    """Record an event; run the configured handler chain — safe mode
    prepends safe_event_handler, then the call's eventHandler, then
    the process default (lib/events.js:34-44 setupEventHandler)."""
    events = options.setdefault("events", []) if isinstance(options, dict) else []
    event = {"code": code, "level": level, "message": message,
             "details": details}
    events.append(event)
    if not isinstance(options, dict):
        return
    chain: list = []
    if options.get("safe"):
        chain.append(safe_event_handler)
    if options.get("eventHandler") is not None:
        chain.append(options["eventHandler"])
    # the default handler is ALWAYS appended after the per-call handler
    # (lib/events.js:34-43 concats all three unconditionally), so a user
    # handler that calls next() falls through to the default
    if _DEFAULT_HANDLER[0] is not None:
        chain.append(_DEFAULT_HANDLER[0])
    if chain:
        _handle(event, chain)
