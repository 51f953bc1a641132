"""N-Quads source/sink for the triples table.

Source parity: the reference registers an N-Quads RDF parser
(lib/jsonld.js:1008) and serializes datasets through NQuads.serialize
(lib/jsonld.js:702-705). Here:

- read: spark.read.text -> mapInPandas regex parse (kernel.nquads) ->
  triples rows. Line-oriented, so it parallelizes by file split with
  no coordination.
- write: the JVM-side formatter (operators.pipeline.nquad_lines) ->
  df.write.text. No Python on the write path.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

TRIPLES_SCHEMA = ("graph string, subj string, pred string, obj_kind string, "
                  "obj_value string, obj_datatype string, obj_lang string")


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    import pandas as pd

    from ..kernel.nquads import parse
    from ..kernel.tordf import quads_to_rows

    lines = spark.read.text(path)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["graph", "subj", "pred", "obj_kind", "obj_value",
                "obj_datatype", "obj_lang"]
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                if not line or line.lstrip().startswith("#"):
                    continue
                out.extend(quads_to_rows(parse(line)))
            yield pd.DataFrame(out, columns=cols)

    return lines.mapInPandas(run, schema=TRIPLES_SCHEMA)


def write_nquads(triples: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    from ..operators.pipeline import nquad_lines

    nquad_lines(triples).write.mode(mode).text(path)
