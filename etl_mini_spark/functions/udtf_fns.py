"""Python UDTF surface (Spark 4): the table-valued counterpart of the
scalar UDF registry (functions/registry.py).

Kept deliberately thin: UDTFs are row-at-a-time Python — the engine's
hot paths use native lateral explodes instead (chunk_documents in
operators/text.py is the production chunker: regexp + sequence +
slice, whole-stage-codegen, no interpreter crossing). The UDTF exists
because the API surface belongs to the engine: ad-hoc table functions
at the ingest edge (irregular parsing, third-party library calls per
row-group) are where the escape hatch earns its keep, and the unit
test pins it row-identical to the native operator so the two can never
drift."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id bigint, chunk string, n_tokens bigint")
class ChunkDocUDTF:
    """Overlapping token-window chunking, identical contract to
    operators/text.py chunk_documents (window tokens per chunk, fixed
    stride, trailing short chunk kept, empty docs emit nothing)."""

    def eval(self, text: str, window: int, stride: int):
        toks = (text or "").split()
        if not toks:
            return
        for chunk_id, start in enumerate(range(0, len(toks), stride)):
            piece = toks[start : start + window]
            yield chunk_id, " ".join(piece), len(piece)
