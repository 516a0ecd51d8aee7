#!/usr/bin/env python
"""Build a local sf1.0-scale perf corpus by upsampling sf0.1 10x.

Measurement infrastructure only (guide §1: optimizations must hold at
the driver's escalated scale factor, which is not shipped with the
sandbox). NOT driver data — results differ from the real sf1.0; only
the performance profile is meant to match:

- documents: per-copy consonant rotation so shingles/minhash bands do
  NOT collide across copies (pair outputs scale ~linearly, like a real
  bigger crawl, instead of quadratically as exact clones would).
- embeddings: per-copy deterministic epsilon so cosine structure stays
  but exact-duplicate vectors don't explode near-dup pair counts.
- relational tables: keys shifted per copy (group-size distribution
  preserved); dimension tables (nation/region/customer/...) copied
  verbatim so join fan-outs stay realistic.

Row-group layout mimics the driver tables: one row group per file
except lineitem (multi-row-group, ~1M rows each).

  python tools/make_scale_corpus.py /root/testdata/sf0.1 /root/sfX 10
"""

from __future__ import annotations

import string
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def upsample(src: str, dst: str, n: int) -> None:
    import os

    os.makedirs(dst, exist_ok=True)
    cons = "bcdfghjklm"

    def docs_copy(t: pa.Table, i: int) -> pa.Table:
        if i == 0:
            return t
        rot = cons[i:] + cons[:i]
        tr = str.maketrans(cons, rot)
        texts = [s.translate(tr) if s is not None else None
                 for s in t.column("text").to_pylist()]
        max_id = 10 ** 8
        return t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pa.array([d + i * max_id for d in t.column("doc_id").to_pylist()],
                     type=pa.int64()),
        ).set_column(
            t.schema.get_field_index("text"), "text",
            pa.array(texts, type=pa.string()),
        )

    def emb_copy(t: pa.Table, i: int) -> pa.Table:
        if i == 0:
            return t
        eps = i * 1e-3
        vecs = [[x + eps for x in v] for v in t.column("embedding").to_pylist()]
        max_id = 10 ** 8
        return t.set_column(
            t.schema.get_field_index("vec_id"), "vec_id",
            pa.array([d + i * max_id for d in t.column("vec_id").to_pylist()],
                     type=pa.int64()),
        ).set_column(
            t.schema.get_field_index("embedding"), "embedding",
            pa.array(vecs, type=pa.list_(pa.float32())),
        )

    def shift_copy(cols: dict[str, int]):
        def f(t: pa.Table, i: int) -> pa.Table:
            if i == 0:
                return t
            out = t
            for c, base in cols.items():
                idx = out.schema.get_field_index(c)
                typ = out.schema.field(idx).type
                out = out.set_column(
                    idx, c,
                    pa.array([v + i * base for v in out.column(c).to_pylist()],
                             type=typ),
                )
            return out
        return f

    plans = {
        "documents": docs_copy,
        "embeddings": emb_copy,
        "lineitem": shift_copy({"l_orderkey": 10 ** 8}),
        "orders": shift_copy({"o_orderkey": 10 ** 8}),
        "events": shift_copy({"event_id": 10 ** 8}),
    }
    verbatim = ["customer", "supplier", "part", "nation", "region"]

    for name, fn in plans.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        parts = [fn(t, i) for i in range(n)]
        big = pa.concat_tables(parts).combine_chunks()
        rg = 10 ** 6 if name == "lineitem" else big.num_rows
        pq.write_table(big, f"{dst}/{name}.parquet", row_group_size=rg)
        print(name, big.num_rows, "rows")
    for name in verbatim:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet", row_group_size=t.num_rows)
        print(name, t.num_rows, "rows (verbatim)")


if __name__ == "__main__":
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    upsample(src, dst, n)
