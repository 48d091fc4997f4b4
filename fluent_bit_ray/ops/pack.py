"""Concat-and-chunk sequence packing via a distributed prefix sum.

Training pipelines pack documents into fixed-length token sequences by
concatenating the corpus in a canonical order and slicing every
`chunk_tokens` tokens. The hard part at 100 TB is the global running
offset — an inherently sequential prefix sum — done here in the classic
two-phase scan shape:

  1. one streaming pass reduces each block to a single token-count subtotal
     (plus its id range, to validate ordering) — tiny fixed-width metadata;
  2. the driver prefix-sums the per-block subtotals (O(#blocks), trivial);
  3. a second parallel pass assigns chunk spans per doc, each block seeded
     with its exclusive base offset — no cross-block communication at all.

PARTITIONING ASSUMPTION (documented per the engine's custom-operator
contract): the canonical order is ascending `id_col`, and input blocks
must be non-overlapping, sorted id ranges — true for the engine's parquet
reads of id-sorted tables (row-group order). Overlapping block ranges
raise rather than silently mis-pack.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _doc_token_counts(batch: pa.Table, text_col: str) -> np.ndarray:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(text, ""))
    lists = pc.utf8_split_whitespace(trimmed)
    raw = np.asarray(pc.list_value_length(lists)).astype(np.int64)
    return np.where(np.asarray(pc.equal(trimmed, "")), 0, raw)


def pack_chunks(
    ds,
    chunk_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Per-doc packing spans: (doc_id, n_tokens, start_chunk, end_chunk)
    where chunk c covers token positions [c*chunk_tokens, (c+1)*chunk_tokens)
    of the concatenated id-ordered corpus. Zero-token docs pin both spans
    to the chunk at their offset."""
    import ray

    @ray.remote
    def block_meta(t: pa.Table):
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = _doc_token_counts(t, text_col)
        if len(ids) == 0:
            return 0, None, None, True
        return int(n.sum()), int(ids.min()), int(ids.max()), bool(
            np.all(np.diff(ids) > 0)
        )

    @ray.remote
    def assign(t: pa.Table, base: int) -> pa.Table:
        ids = t[id_col]
        n = _doc_token_counts(t, text_col)
        off = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        start = off // chunk_tokens
        end = np.where(n > 0, (off + np.maximum(n, 1) - 1) // chunk_tokens,
                       start)
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(n),
                "start_chunk": pa.array(start.astype(np.int64)),
                "end_chunk": pa.array(end.astype(np.int64)),
            }
        )

    refs = list(ds.to_arrow_refs())
    metas = ray.get([block_meta.remote(r) for r in refs])
    live = [(r, m) for r, m in zip(refs, metas) if m[1] is not None]
    # validate the documented ordering contract before packing anything
    live.sort(key=lambda rm: rm[1][1])
    prev_max = None
    for _, (_, lo, hi, inner_sorted) in live:
        if not inner_sorted or (prev_max is not None and lo <= prev_max):
            raise ValueError(
                "pack_chunks needs id-sorted, non-overlapping input blocks "
                f"(block range [{lo}, {hi}] overlaps or is unsorted)"
            )
        prev_max = hi
    base, out_refs = 0, []
    for r, (subtotal, _, _, _) in live:
        out_refs.append(assign.remote(r, base))
        base += subtotal
    if not out_refs:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "start_chunk": pa.array([], pa.int64()),
                "end_chunk": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(ray.get(out_refs))


def chunk_documents(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """RAG-style per-document overlapping chunking: each doc splits into
    windows of `chunk_tokens` tokens advancing by `chunk_tokens - overlap`
    (the last window may be short; a doc with <= chunk_tokens tokens is
    one chunk; empty docs emit nothing). Emits (id, chunk_idx, start_tok,
    n_tok, chunk_text) where chunk_text joins the window's tokens with a
    single space (= SQL array_to_string of the token-array slice, the
    oracle form).

    Pure per-batch map — chunking is doc-local, so it streams with no
    shuffle and no state. Fully vectorized: ragged per-chunk token index
    ranges are built with one repeat/arange pass, gathered from the flat
    token stream, and joined per chunk by ONE Arrow binary_join.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def chunk(b: pa.Table) -> pa.Table:
        from .text import _doc_tokens

        empty = pa.table(
            {
                id_col: pa.array([], b.schema.field(id_col).type),
                "chunk_idx": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )
        flat, bounds, n_tokens = _doc_tokens(b[text_col])
        live = np.flatnonzero(n_tokens > 0)
        if len(live) == 0:
            return empty
        n = n_tokens[live]
        # chunks per doc: 1 if n <= chunk else 1 + ceil((n - chunk)/stride)
        extra = np.maximum(n - chunk_tokens, 0)
        n_chunks = 1 + (extra + stride - 1) // stride
        doc_of = np.repeat(np.arange(len(live)), n_chunks)
        # chunk_idx within each doc via the ragged-arange idiom
        coff = np.concatenate(([0], np.cumsum(n_chunks)))
        cidx = np.arange(coff[-1]) - np.repeat(coff[:-1], n_chunks)
        start = cidx * stride
        length = np.minimum(chunk_tokens, n[doc_of] - start)
        # gather the window tokens from the flat stream
        gstart = bounds[live][doc_of] + start
        toff = np.concatenate(([0], np.cumsum(length)))
        ridx = (np.repeat(gstart, length)
                + np.arange(toff[-1]) - np.repeat(toff[:-1], length))
        toks = flat.take(pa.array(ridx, pa.int64()))
        lists = pa.ListArray.from_arrays(pa.array(toff, pa.int32()), toks)
        texts = pc.binary_join(lists, " ")
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids.take(pa.array(live[doc_of], pa.int64())),
                "chunk_idx": pa.array(cidx),
                "start_tok": pa.array(start),
                "n_tok": pa.array(length),
                "chunk_text": texts,
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")
