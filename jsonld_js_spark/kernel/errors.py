"""JSON-LD processing errors.

Parity: /root/reference/lib/JsonLdError.js — errors carry a spec
error `code` that negative conformance tests match on.
"""


class JsonLdError(Exception):
    def __init__(self, message: str, name: str = "jsonld.Error", code: str | None = None, details: dict | None = None):
        super().__init__(message)
        self.message = message
        self.name = name
        self.code = code
        self.details = details or {}

    def __repr__(self):  # pragma: no cover
        return f"JsonLdError({self.name!r}, code={self.code!r}, {self.message!r})"


def syntax_error(message: str, code: str, **details) -> JsonLdError:
    return JsonLdError(message, "jsonld.SyntaxError", code, details)
