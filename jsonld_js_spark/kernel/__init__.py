"""Pure-Python JSON-LD 1.1 kernels.

No Spark imports here: every function is a plain (data -> data)
transform designed to run per-document inside Arrow UDF batches on
executors, or on the driver for context pre-resolution.

Behavioral reference: digitalbazaar/jsonld.js (see SURVEY.md for the
file:line map). The code is written fresh against the W3C JSON-LD 1.1
API / RDF Dataset Canonicalization specs; citations in docstrings
point at the reference only to document parity.
"""

from .api import (  # noqa: F401
    JsonLdProcessor,
    canonize,
    compact,
    expand,
    flatten,
    frame,
    from_rdf,
    get,
    get_context_value,
    link,
    process_context_api,
    to_rdf,
)
from .events import (  # noqa: F401
    log_event_handler,
    log_warning_event_handler,
    safe_event_handler,
    set_default_event_handler,
    unhandled_event_handler,
)
