"""Event-handler chain parity (lib/events.js:34-101,132-180) and
obsolete-option errors."""

import pytest

from jsonld_js_spark.kernel import expand
from jsonld_js_spark.kernel.errors import JsonLdError
from jsonld_js_spark.kernel.events import (
    set_default_event_handler,
    unhandled_event_handler,
)

V = "http://vocab.org/"
WARN_DOC = {"@context": {"@vocab": V}, "@id": "http://e/a",
            "p": {"@value": None}, "q": "keep"}  # one warning only


def test_function_handler_receives_event_and_next():
    seen = []

    def handler(*, event, next):
        seen.append(event["code"])
        next()

    expand(WARN_DOC, {"eventHandler": handler})
    assert seen == ["null @value value"]


def test_handler_not_calling_next_stops_chain():
    calls = []

    def first(*, event, next):
        calls.append("first")  # no next(): second must not run

    def second(*, event, next):
        calls.append("second")
        next()

    expand(WARN_DOC, {"eventHandler": [first, second]})
    assert calls == ["first"]


def test_code_map_handler_dispatches_and_falls_through():
    hits = []
    handler = {"null @value value":
               lambda *, event, next: (hits.append(event["code"]), next())}
    expand(WARN_DOC, {"eventHandler": [handler, lambda *, event, next:
                                       (hits.append("tail"), next())]})
    assert hits == ["null @value value", "tail"]
    # unknown code falls through the dict to the next handler
    hits2 = []
    expand(WARN_DOC, {"eventHandler": [{"other code": lambda **kw: None},
                                       lambda *, event, next:
                                       hits2.append(event["code"])]})
    assert hits2 == ["null @value value"]


def test_unhandled_event_handler_throws():
    with pytest.raises(JsonLdError) as ei:
        expand(WARN_DOC, {"eventHandler": unhandled_event_handler})
    assert "UnhandledEvent" in (ei.value.name or "")


def test_invalid_handler_type_rejected():
    with pytest.raises(JsonLdError):
        expand(WARN_DOC, {"eventHandler": 42})


def test_default_event_handler_used_when_unset():
    seen = []
    set_default_event_handler(lambda *, event, next: seen.append(event["code"]))
    try:
        expand(WARN_DOC, {})
        assert seen == ["null @value value"]
        # per-call handler takes precedence over the default
        seen2 = []
        expand(WARN_DOC, {"eventHandler": lambda *, event, next:
                          seen2.append("call")})
        assert seen2 == ["call"] and seen == ["null @value value"]
    finally:
        set_default_event_handler(None)


def test_safe_mode_prepends_safe_handler():
    seen = []
    with pytest.raises(JsonLdError):
        expand(WARN_DOC, {"safe": True,
                          "eventHandler": lambda *, event, next:
                          seen.append(event["code"])})
    assert seen == []  # safe handler threw before the user handler ran


@pytest.mark.parametrize("opt", ["compactionMap", "expansionMap"])
def test_obsolete_options_error(opt):
    with pytest.raises(JsonLdError) as ei:
        expand({"@id": "http://e/a"}, {opt: lambda: None})
    assert "OptionsError" in (ei.value.name or "")


def test_user_handler_next_falls_through_to_default():
    """setupEventHandler (lib/events.js:34-43) concats the per-call
    handler AND the default handler unconditionally: a user handler
    that calls next() falls through to the process default."""
    seen = []
    set_default_event_handler(lambda *, event, next: seen.append("default"))
    try:
        calls = []

        def user(*, event, next):
            calls.append(event["code"])
            next()
        expand(WARN_DOC, {"eventHandler": user})
        assert calls == ["null @value value"]
        assert seen == ["default"]
        # without next(), the default is NOT reached
        seen.clear()
        expand(WARN_DOC, {"eventHandler": lambda *, event, next: None})
        assert seen == []
    finally:
        set_default_event_handler(None)
