"""Content-type -> reader/writer registry.

Parity: the reference's RDF parser registry keyed by content type
(lib/jsonld.js:994-1005, registerRDFParser). Ours maps content types
to (spark, path) -> DataFrame readers and (df, path) -> writers, and
is user-extensible the same way.
"""

from __future__ import annotations

from typing import Callable

_READERS: dict[str, Callable] = {}
_WRITERS: dict[str, Callable] = {}


def register_reader(content_type: str, fn: Callable) -> None:
    _READERS[content_type] = fn


def register_writer(content_type: str, fn: Callable) -> None:
    _WRITERS[content_type] = fn


def reader(content_type: str) -> Callable:
    try:
        return _READERS[content_type]
    except KeyError:
        raise ValueError(f"no reader registered for {content_type!r}; "
                         f"known: {sorted(_READERS)}") from None


def writer(content_type: str) -> Callable:
    try:
        return _WRITERS[content_type]
    except KeyError:
        raise ValueError(f"no writer registered for {content_type!r}; "
                         f"known: {sorted(_WRITERS)}") from None


def _install_defaults() -> None:
    from .nquads_io import read_nquads, write_nquads

    register_reader("application/n-quads", read_nquads)
    register_writer("application/n-quads", write_nquads)
    register_reader("parquet", lambda spark, path: spark.read.parquet(path))
    register_writer("parquet",
                    lambda df, path: df.write.mode("overwrite").parquet(path))


_install_defaults()
