"""Document loader semantics — parity with the reference's node loader.

The reference dereferences over HTTP (lib/documentLoaders/node.js);
distributed executors must never do network I/O, so the same SEMANTICS
run here against in-memory fixtures: ``static_document_loader`` takes
a url -> response table (the shape of the reference's local test
server, tests/test-server.js) and replicates, faithfully:

- scheme gating (http/https only; ``secure`` requires https)
  — node.js:55-71
- HTTP >= 400 -> "loading document failed" — node.js:84-94
- Link-header handling when content-type is not application/ld+json:
  a single http://www.w3.org/ns/json-ld#context link populates
  ``contextUrl`` (two -> "multiple context link headers"); an
  ``alternate`` link of type application/ld+json acts as a redirect
  when the content-type is not JSON — node.js:96-123
- 3xx + Location redirects with a redirect cap ("too many
  redirects") and loop detection ("recursive context inclusion"),
  relative Locations resolved against the current url — node.js:125-152

``parse_link_header`` ports util.js:109-147 (unquoted-comma split,
per-entry params, repeated rel -> list).
"""

from __future__ import annotations

import json
import re

from .errors import JsonLdError
from .iri import prepend_base

LINK_HEADER_CONTEXT = "http://www.w3.org/ns/json-ld#context"

_REGEX_LINK_HEADERS = re.compile(r'(?:<[^>]*?>|"[^"]*?"|[^,])+')
_REGEX_LINK_HEADER = re.compile(r'\s*<([^>]*?)>\s*(?:;\s*(.*))?')
_REGEX_LINK_HEADER_PARAMS = re.compile(
    r'(.*?)=(?:(?:"([^"]*?)")|([^"]*?))\s*(?:(?:;\s*)|$)')


def parse_link_header(header: str) -> dict:
    """Link header -> {rel: {target, **params}} (list on repeated rel)."""
    rval: dict = {}
    for entry in _REGEX_LINK_HEADERS.findall(header):
        m = _REGEX_LINK_HEADER.match(entry)
        if not m:
            continue
        result = {"target": m.group(1)}
        params = m.group(2) or ""
        for pm in _REGEX_LINK_HEADER_PARAMS.finditer(params):
            result[pm.group(1)] = (pm.group(3) if pm.group(2) is None
                                   else pm.group(2))
        rel = result.get("rel", "")
        if isinstance(rval.get(rel), list):
            rval[rel].append(result)
        elif rel in rval:
            rval[rel] = [rval[rel], result]
        else:
            rval[rel] = result
    return rval


_JSON_CONTENT = re.compile(r"^application/(\w*\+)?json$")


def static_document_loader(responses: dict, *, secure: bool = False,
                           max_redirects: int = 8):
    """Loader over an in-memory url -> response table.

    Each response is ``{"status": 200, "headers": {...}, "body": ...}``
    (or a bare document object, treated as a 200 application/ld+json
    response). Returns the reference loader's remote-document shape:
    ``{"contextUrl", "documentUrl", "document"}``.
    """

    def normalize(resp):
        if not isinstance(resp, dict) or "body" not in resp:
            return {"status": 200,
                    "headers": {"content-type": "application/ld+json"},
                    "body": resp}
        r = {"status": resp.get("status", 200), "body": resp.get("body"),
             "headers": {k.lower(): v
                         for k, v in (resp.get("headers") or {}).items()}}
        r["headers"].setdefault("content-type", "application/ld+json")
        return r

    def load(url: str, redirects: list | None = None) -> dict:
        redirects = redirects or []
        is_http = url.startswith("http://")
        is_https = url.startswith("https://")
        if not is_http and not is_https:
            raise JsonLdError(
                'URL could not be dereferenced; only "http" and "https" '
                "URLs are supported.", "jsonld.InvalidUrl",
                code="loading document failed", details={"url": url})
        if secure and not is_https:
            raise JsonLdError(
                "URL could not be dereferenced; secure mode is enabled and "
                'the URL\'s scheme is not "https".', "jsonld.InvalidUrl",
                code="loading document failed", details={"url": url})
        if url not in responses:
            raise JsonLdError(
                f'URL "{url}" could not be dereferenced: Not Found',
                "jsonld.InvalidUrl", code="loading document failed",
                details={"url": url, "httpStatusCode": 404})
        resp = normalize(responses[url])
        status = resp["status"]
        if status >= 400:
            raise JsonLdError(
                f'URL "{url}" could not be dereferenced: status {status}',
                "jsonld.InvalidUrl", code="loading document failed",
                details={"url": url, "httpStatusCode": status})

        doc = {"contextUrl": None, "documentUrl": url,
               "document": resp["body"]}
        link = resp["headers"].get("link")
        location = resp["headers"].get("location")
        content_type = resp["headers"].get("content-type")

        alternate = None
        if link and content_type != "application/ld+json":
            link_headers = parse_link_header(link)
            linked_context = link_headers.get(LINK_HEADER_CONTEXT)
            if isinstance(linked_context, list):
                raise JsonLdError(
                    "URL could not be dereferenced, it has more than one "
                    "associated HTTP Link Header.", "jsonld.InvalidUrl",
                    code="multiple context link headers",
                    details={"url": url})
            if linked_context:
                doc["contextUrl"] = linked_context["target"]
            alternate = link_headers.get("alternate")
            if (alternate and alternate.get("type") == "application/ld+json"
                    and not _JSON_CONTENT.match(content_type or "")):
                location = prepend_base(url, alternate["target"])

        if (alternate or 300 <= status < 400) and location:
            if len(redirects) == max_redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; there were too many "
                    "redirects.", "jsonld.TooManyRedirects",
                    code="loading document failed",
                    details={"url": url, "httpStatusCode": status,
                             "redirects": list(redirects)})
            if url in redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; infinite redirection "
                    "was detected.", "jsonld.InfiniteRedirectDetected",
                    code="recursive context inclusion",
                    details={"url": url, "httpStatusCode": status,
                             "redirects": list(redirects)})
            redirects.append(url)
            next_url = prepend_base(url, location)
            return load(next_url, redirects)

        return doc

    return load


def get_document(url: str, options: dict) -> dict:
    """jsonld.get parity (lib/jsonld.js:560-590): dereference via
    options['document_loader'] (a callable; static_document_loader
    builds one) and parse string bodies as JSON."""
    load = options.get("document_loader")
    if not callable(load):
        loader = options.get("context_loader") or {}
        if url in loader:
            return {"contextUrl": None, "documentUrl": url,
                    "document": loader[url]}
        raise JsonLdError(
            "Could not retrieve a JSON-LD document from the URL.",
            "jsonld.LoadDocumentError", code="loading document failed",
            details={"url": url})
    remote_doc = load(url)
    try:
        if remote_doc.get("document") is None:
            raise JsonLdError("No remote document found at the given URL.",
                              "jsonld.NullRemoteDocument")
        if isinstance(remote_doc["document"], str):
            remote_doc = {**remote_doc,
                          "document": json.loads(remote_doc["document"])}
    except JsonLdError:
        raise JsonLdError(
            "Could not retrieve a JSON-LD document from the URL.",
            "jsonld.LoadDocumentError", code="loading document failed",
            details={"url": url})
    except ValueError as e:
        raise JsonLdError(
            "Could not retrieve a JSON-LD document from the URL.",
            "jsonld.LoadDocumentError", code="loading document failed",
            details={"url": url}) from e
    return remote_doc
