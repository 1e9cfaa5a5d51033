"""Deterministic scale-up of the driver's synthetic testdata.

Produces an sfN directory from an existing sfM directory by writing
``copies`` key-shifted replicas of every table (the standard
replicate-with-key-offset scaling trick). Referential integrity is
preserved: every int64 entity key (custkey, orderkey, partkey,
suppkey, event_id, user_id, doc_id, vec_id) is shifted by
``copy_index * KEY_OFFSET`` on BOTH sides of each FK relationship, so
join fan-outs, group cardinalities and key-mod-derived snapshot
predicates (o_orderkey % 10, doc_id % 7 ...) keep the same selectivity
per copy. Matches the driver generator's observed scaling behavior
(sf0.01 -> sf0.1): fact tables, dim tables (customer/supplier/part)
AND events.user_id cardinality all scale 10x, while region/nation stay
fixed and the events time range stays fixed (event density grows).

Text/embedding copies are decorrelated so similarity workloads scale
linearly, the way a real 10x corpus would, instead of degenerating
into 10-clone cliques (which would scale candidate pair counts
quadratically): tokens get a per-copy suffix (disjoint vocabularies
across copies -> zero cross-copy shingle sharing) and embeddings get a
small deterministic perturbation.

Usage:  python tools/gen_scale.py [--src /root/testdata/sf0.1] \
            [--dst /root/repo/.data/sf1] [--copies 10]

Output is ~10x the source size (sf1 ~ 170 MB) and lives under the
repo's gitignored .data/ directory — never under /root/testdata.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Far above any sf0.1 key; congruent to 0 mod 10 so %10-derived
# snapshot predicates keep per-copy selectivity.
KEY_OFFSET = 10_000_000

# int64 entity-key columns to shift, per table. region/nation are
# fixed dims (constant across scale factors, like TPC-H).
SHIFT: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _shift_keys(table: pa.Table, cols: list[str], delta: int) -> pa.Table:
    for c in cols:
        idx = table.schema.get_field_index(c)
        table = table.set_column(
            idx, table.schema.field(idx), pc.add(table.column(c), delta)
        )
    return table


def _decorrelate_text(table: pa.Table, copy: int) -> pa.Table:
    """Suffix every whitespace token with the copy index.

    Copies share no tokens/shingles with each other, so near-dup and
    tf-idf workloads scale linearly with corpus size. n_chars is
    recomputed to stay consistent with the rewritten text.
    """
    texts = table.column("text").to_pylist()
    suffix = str(copy)
    new = [" ".join(t + suffix for t in s.split()) for s in texts]
    t = table.set_column(
        table.schema.get_field_index("text"), "text", pa.array(new, pa.string())
    )
    n_chars = pa.array([len(s) for s in new], pa.int64())
    return t.set_column(t.schema.get_field_index("n_chars"), "n_chars", n_chars)


def _perturb_embeddings(table: pa.Table, copy: int) -> pa.Table:
    """Deterministically jitter vectors (~1e-2 per component).

    Keeps copies *near* their originals (a realistic near-dup corpus)
    without exact clones; seeded by (copy, row, component).
    """
    col = table.column("embedding").combine_chunks()
    mat = np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float32)
    rng = np.random.default_rng(42 + copy)
    mat = mat + rng.uniform(-0.01, 0.01, size=mat.shape).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), pa.float32()), mat.shape[1]
    ).cast(pa.list_(pa.float32()))
    return table.set_column(
        table.schema.get_field_index("embedding"), "embedding", arr
    )


def scale_table(name: str, src: Path, dst: Path, copies: int) -> int:
    """Streams one shifted copy at a time into a single ParquetWriter,
    so peak memory is one copy regardless of the target scale (sf100 =
    1000 copies of sf0.1 would not fit as a concat)."""
    base = pq.read_table(src / f"{name}.parquet")
    if not SHIFT[name]:  # fixed dims: copy verbatim
        pq.write_table(base, dst / f"{name}.parquet")
        return base.num_rows
    rows = 0
    with pq.ParquetWriter(dst / f"{name}.parquet", base.schema) as writer:
        for i in range(copies):
            t = _shift_keys(base, SHIFT[name], i * KEY_OFFSET)
            if i > 0 and name == "documents":
                t = _decorrelate_text(t, i)
            if i > 0 and name == "embeddings":
                t = _perturb_embeddings(t, i)
            # normalize incidental metadata (list child field names)
            t = t.cast(base.schema)
            writer.write_table(t, row_group_size=256 * 1024)
            rows += t.num_rows
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.data/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    for name in SHIFT:
        n = scale_table(name, src, dst, args.copies)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
