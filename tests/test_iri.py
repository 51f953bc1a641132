"""RFC 3986 §5.4 reference-resolution examples (normal + abnormal).

These are the edge cases stdlib urljoin gets wrong and the JSON-LD
suite exercises (SURVEY §2.2: do NOT use urljoin).
"""

import pytest

from jsonld_js_spark.kernel.iri import (
    is_absolute_iri,
    prepend_base,
    remove_dot_segments,
)

BASE = "http://a/b/c/d;p?q"

NORMAL = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]

ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y/./x"),
    ("g?y/../x", "http://a/b/c/g?y/../x"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
]


@pytest.mark.parametrize("ref,expected", NORMAL + ABNORMAL)
def test_rfc3986_resolution(ref, expected):
    assert prepend_base(BASE, ref) == expected


def test_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    assert remove_dot_segments("") == ""
    assert remove_dot_segments("/") == "/"


def test_is_absolute():
    assert is_absolute_iri("http://example.org/x")
    assert is_absolute_iri("urn:uuid:1234")
    assert is_absolute_iri("http://example.org/x#frag")
    assert not is_absolute_iri("//example.org/x")
    assert not is_absolute_iri("relative/path")
    assert not is_absolute_iri("#frag")
    assert not is_absolute_iri(None)


def test_empty_base_passthrough():
    assert prepend_base(None, "rel") == "rel"
    assert prepend_base("", "rel") == "rel"


def test_base_without_path():
    assert prepend_base("http://a", "g") == "http://a/g"
    assert prepend_base("http://a?q", "g") == "http://a/g"
