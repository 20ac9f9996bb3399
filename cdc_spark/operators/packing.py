"""Sequence packing: fill fixed token-budget bins with documents.

Training pipelines concatenate documents into fixed-length contexts;
padding waste is the metric. Exact global bin packing is NP-hard and
inherently sequential, so the distributed shape is: hash documents
into independent pack groups, pack each group locally with a
deterministic next-fit pass, and emit (group, bin, position)
assignments. Waste stays within a fraction of a percent of local
first-fit for web-scale corpora because every group sees thousands of
documents.

Scale shape: ONE shuffle (hash by pack group), then an Arrow-batched
``applyInPandas`` whose per-group memory is corpus_size / n_groups —
size ``n_groups`` so a group fits an executor (e.g. 1e6 groups at
100 TB → ~100 MB/group). No driver state, no global sort.

Determinism: group = xxhash64(id) % n_groups and packing order =
ascending id, so the assignment is a pure function of the input set —
stable under repartitioning, retries, and engine parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    budget: int,
    n_groups: int = 64,
) -> DataFrame:
    """Assign each row to a (pack_group, bin_idx, pos_in_bin) slot.

    Next-fit per group in ascending ``id_col`` order: a document that
    would overflow the open bin closes it and starts the next one. A
    document longer than ``budget`` gets a bin of its own (callers
    truncate or split upstream; the assignment stays total).

    Returns the input's (id, tokens) plus ``pack_group``, ``bin_idx``,
    ``pos_in_bin`` and the final ``bin_fill`` of its bin.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    import pandas as pd

    out_schema = (
        f"{id_col} long, {tokens_col} long, pack_group int, "
        "bin_idx long, pos_in_bin int, bin_fill long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bin_idx, pos, fill = [], [], []
        cur_bin, cur_fill, cur_pos = 0, 0, 0
        fills: list[int] = []
        for t in pdf[tokens_col]:
            t = int(t)
            if cur_pos > 0 and cur_fill + t > budget:
                fills.append(cur_fill)
                cur_bin += 1
                cur_fill, cur_pos = 0, 0
            bin_idx.append(cur_bin)
            pos.append(cur_pos)
            cur_fill += t
            cur_pos += 1
        fills.append(cur_fill)
        pdf = pdf.assign(
            bin_idx=pd.Series(bin_idx, dtype="int64"),
            pos_in_bin=pd.Series(pos, dtype="int32"),
            bin_fill=pd.Series(
                [fills[b] for b in bin_idx], dtype="int64"
            ),
        )
        return pdf[
            [id_col, tokens_col, "pack_group", "bin_idx", "pos_in_bin",
             "bin_fill"]
        ]

    tagged = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
        .cast("int")
        .alias("pack_group"),
    )
    return tagged.groupBy("pack_group").applyInPandas(pack, out_schema)


def concat_chunk_plan(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    budget: int,
    n_groups: int = 64,
) -> DataFrame:
    """GPT-style concat-and-chunk packing plan: documents concatenated
    in ascending ``id_col`` order within a pack group, the token stream
    sliced into fixed ``budget`` windows, documents allowed to SPAN
    window boundaries (the EOD-token training layout — zero padding
    waste by construction, unlike bin packing).

    Because the chunk of every token is a pure function of the running
    offset, the whole plan is one window cumulative sum — no Python,
    no sequential fold, and (unlike next-fit) exactly reproducible by
    any SQL engine. Returns per document: its group, start offset in
    the group's token stream, first/last context window touched, and
    how many windows it spans.

    Scale shape: the per-group cumulative sum runs on
    ``operators/ordering.py::grouped_prefix_sum`` — a
    ``Window.partitionBy(pack_group)`` would bound parallelism at
    ``n_groups`` reducers each holding corpus/n_groups rows (the q39
    class). Since ids are DENSE, it takes the deterministic-slice
    fast path (round 9): bucket = floor(id·32/N) hash-keys the
    two-pass decomposition, so there is no sampled range exchange and
    no localCheckpoint layout pin — at 100 TB that pin is a full
    extra write of the dataset; the cost moved to one extra columnar
    scan feeding a map-side-combined B×G-row totals aggregate.
    Bit-identical output, so the dp03 oracle keeps its plain
    ``SUM() OVER (PARTITION BY ...)`` SQL.

    Group assignment is ``id % n_groups`` (not xxhash64) so external
    engines can recompute the layout bit-for-bit; ids are synthetic
    and uniform, so the modulo is as balanced as the hash.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from cdc_spark.operators.ordering import grouped_prefix_sum

    sized = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        F.pmod(F.col(id_col), F.lit(n_groups)).cast("int").alias("pack_group"),
    )
    # ids are dense, so a deterministic slice id exists: floor(id*B/N)
    # is monotone in id within every group with <= B=32 values — the
    # grouped_prefix_sum bucket fast path (no sampled ranges, no
    # localCheckpoint layout pin; at 100 TB the pin is a full extra
    # write). max(id) is one planning-time 1-row aggregate, the same
    # bounded-collect class as the ANN codebook seeds.
    max_id = sized.agg(F.max(id_col)).first()[0]
    n_ids = (max_id or 0) + 1
    slice_width = max(1, -(-n_ids // 32))  # ceil(N/32)
    bucket = F.floor(F.col(id_col) / F.lit(slice_width))
    out = grouped_prefix_sum(
        sized,
        "pack_group",
        [id_col],
        tokens_col,
        out_col="start_offset",
        inclusive=False,
        bucket=bucket,
    ).select(id_col, tokens_col, "pack_group", "start_offset")
    first_bin = F.floor(F.col("start_offset") / budget).alias("first_bin")
    # empty docs (n_tokens=0) occupy no tokens: pin them to first_bin
    last_tok = F.col("start_offset") + F.greatest(
        F.col(tokens_col), F.lit(1)
    ) - 1
    last_bin = F.floor(last_tok / budget).alias("last_bin")
    return out.select(
        id_col,
        tokens_col,
        "pack_group",
        "start_offset",
        first_bin,
        last_bin,
        (F.floor(last_tok / budget) - F.floor(F.col("start_offset") / budget)
         + 1).alias("n_windows"),
    )


def packing_efficiency(packed: DataFrame, *, budget: int) -> DataFrame:
    """Per-group waste summary: bins, tokens, fill ratio."""
    bins = packed.groupBy("pack_group", "bin_idx").agg(
        F.first("bin_fill").alias("fill")
    )
    return bins.groupBy("pack_group").agg(
        F.count("*").alias("n_bins"),
        F.sum("fill").alias("total_tokens"),
        F.round(F.sum("fill") / (F.count("*") * F.lit(budget)), 4).alias(
            "fill_ratio"
        ),
    )
