"""Python UDTF (table function) coverage — the last user-extension
shape in the surface matrix (SURVEY.md §2F: UDF/UDAF/UDTF).

One representative: expand a document into (shingle, position) rows.
Note the engine's JVM-first stance still applies — the production
shingle path is ``functions.word_shingles`` (codegen'd arrays); this
UDTF exists to prove the extension point and is tested for agreement
with the JVM twin.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="shingle: string, pos: int")
class ShingleExpand:
    """lateral-join table function: yields k-word shingles of a text."""

    def eval(self, text: str, k: int):  # noqa: D102
        if not text or k is None or k <= 0:
            return
        toks = text.split()
        for i in range(len(toks) - k + 1):
            yield " ".join(toks[i : i + k]), i
