"""Funnel / retention / sequence analytics aggregates
(`src/AggregateFunctions/registerAggregateFunctions.cpp:35-36,59,76`).

windowFunnel replicates `AggregateFunctionWindowFunnel.h:154-215` exactly
(default mode, no strict flags): events sorted by (ts, cond_idx); a cond-1
event (re)starts a chain (stores its ts); a cond-k event upgrades the chain
iff level k-1 was reached and ts ≤ chain_start + window, *propagating the
chain-start timestamp*; result is the deepest level reached.

Implementation is a pure Catalyst expression: explode matching conditions →
collect_list(struct(ts, idx)) → array_sort → aggregate() state machine with
a struct accumulator. One shuffle (groupBy user); per-group state is O(1).
No Python UDFs — the state machine compiles into codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _entries(df: DataFrame, ts_col: str, user_col: str, conds: Sequence[Column]) -> DataFrame:
    """(user, struct(ts_micros, cond_idx)) — one row per condition an event
    matches (an event may match several)."""
    tagged = F.array(
        *[
            F.when(
                cond,
                F.struct(
                    F.unix_micros(F.col(ts_col)).alias("ts"),
                    F.lit(i + 1).cast("int").alias("idx"),
                ),
            )
            for i, cond in enumerate(conds)
        ]
    )
    return df.select(
        F.col(user_col).alias("user"),
        F.explode(F.filter(tagged, lambda x: x.isNotNull())).alias("e"),
    )


def window_funnel(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    conds: Sequence[Column],
    window_seconds: int,
) -> DataFrame:
    """Returns (user, level) with level ∈ [0, len(conds)]."""
    n = len(conds)
    win = int(window_seconds) * 1_000_000  # micros
    ent = _entries(df, ts_col, user_col, conds)
    grouped = ent.groupBy("user").agg(F.array_sort(F.collect_list("e")).alias("evs"))

    zero = F.struct(
        *[F.lit(None).cast("long").alias(f"l{k}") for k in range(1, n + 1)]
    )

    def merge(acc: Column, e: Column) -> Column:
        fields = [F.when(e["idx"] == 1, e["ts"]).otherwise(acc["l1"]).alias("l1")]
        for k in range(2, n + 1):
            prev = acc[f"l{k-1}"]
            fields.append(
                F.when(
                    (e["idx"] == k) & prev.isNotNull() & (e["ts"] <= prev + F.lit(win)),
                    prev,
                )
                .otherwise(acc[f"l{k}"])
                .alias(f"l{k}")
            )
        return F.struct(*fields)

    def finish(acc: Column) -> Column:
        level = F.lit(0)
        for k in range(1, n + 1):
            level = F.when(acc[f"l{k}"].isNotNull(), k).otherwise(level)
        return level

    return grouped.select(
        "user", F.aggregate("evs", zero, merge, finish).cast("int").alias("level")
    )


def retention(
    df: DataFrame, user_col: str, conds: Sequence[Column]
) -> DataFrame:
    """retention(cond1, cond2, ...): r1 = cond1 ever true; r_i (i>1) =
    cond1 AND cond_i both ever true (AggregateFunctionRetention semantics).
    Returns (user, r1..rn as 0/1 ints)."""
    aggs = [F.max(F.when(conds[0], 1).otherwise(0)).alias("r1")]
    for i, c in enumerate(conds[1:], start=2):
        aggs.append(F.max(F.when(c, 1).otherwise(0)).alias(f"_c{i}"))
    g = df.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    out = [F.col("r1")]
    for i in range(2, len(conds) + 1):
        out.append((F.col("r1") * F.col(f"_c{i}")).alias(f"r{i}"))
    return g.select("user", *out)


def sequence_match(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    conds: Sequence[Column],
) -> DataFrame:
    """sequenceMatch('(?1).*(?2)...') — ordered subsequence exists ⇔
    windowFunnel with an unbounded window reaches the last level."""
    huge = 10**12  # seconds; effectively unbounded
    lv = window_funnel(df, ts_col, user_col, conds, huge)
    return lv.select(
        "user", (F.col("level") == len(conds)).cast("int").alias("matched")
    )


def _entries_with_foreign(
    df: DataFrame, ts_col: str, user_col: str, conds: Sequence[Column]
) -> DataFrame:
    """Like _entries, but events matching NO condition are kept with idx=0 —
    strict_order needs to see intervening foreign events."""
    tagged = F.array(
        *[
            F.when(
                cond,
                F.struct(
                    F.unix_micros(F.col(ts_col)).alias("ts"),
                    F.lit(i + 1).cast("int").alias("idx"),
                ),
            )
            for i, cond in enumerate(conds)
        ]
    )
    matched = F.filter(tagged, lambda x: x.isNotNull())
    with_foreign = F.when(F.size(matched) > 0, matched).otherwise(
        F.array(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("ts"),
                F.lit(0).cast("int").alias("idx"),
            )
        )
    )
    return df.select(
        F.col(user_col).alias("user"), F.explode(with_foreign).alias("e")
    )


def window_funnel_strict(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    conds: Sequence[Column],
    window_seconds: int,
    modes: Sequence[str] = (),
) -> DataFrame:
    """windowFunnel with the reference's strict flags
    (`AggregateFunctionWindowFunnel.h`, modes parsed at `:239-247`):

      - ``strict_order``    an intervening foreign event (matching no
                            condition) freezes the funnel at its level;
      - ``strict_dedup``    a repeat of an already-achieved condition
                            freezes it;
      - ``strict_increase`` each step's timestamp must strictly exceed the
                            previous step's (equal timestamps don't chain).

    The accumulator carries per level both the chain-START timestamp
    (window checks, like the default) and the ACHIEVING event's timestamp
    (strict_increase compares against it, as the reference's per-level
    (first, last) pairs do). Same plan shape as the default: one groupBy
    shuffle, codegen fold, no Python.
    """
    bad = set(modes) - {"strict_order", "strict_dedup", "strict_increase"}
    if bad:
        raise ValueError(f"unknown windowFunnel modes: {sorted(bad)}")
    n = len(conds)
    win = int(window_seconds) * 1_000_000
    s_order = "strict_order" in modes
    s_dedup = "strict_dedup" in modes
    s_inc = "strict_increase" in modes
    ent = (
        _entries_with_foreign(df, ts_col, user_col, conds)
        if s_order
        else _entries(df, ts_col, user_col, conds)
    )
    grouped = ent.groupBy("user").agg(
        F.array_sort(F.collect_list("e")).alias("evs")
    )

    nulll = F.lit(None).cast("long")
    zero = F.struct(
        *[nulll.alias(f"s{k}") for k in range(1, n + 1)],
        *[nulll.alias(f"p{k}") for k in range(1, n + 1)],
        F.lit(False).alias("frz"),
    )

    def merge(acc: Column, e: Column) -> Column:
        frz_e = acc["frz"]
        if s_order:
            frz_e = frz_e | ((e["idx"] == 0) & acc["s1"].isNotNull())
        if s_dedup:
            dup = F.lit(False)
            for k in range(1, n + 1):
                dup = dup | ((e["idx"] == k) & acc[f"s{k}"].isNotNull())
            frz_e = frz_e | dup
        starts = [
            F.when((e["idx"] == 1) & ~frz_e, e["ts"]).otherwise(acc["s1"]).alias("s1")
        ]
        lasts = [
            F.when((e["idx"] == 1) & ~frz_e, e["ts"]).otherwise(acc["p1"]).alias("p1")
        ]
        for k in range(2, n + 1):
            sp, pp = acc[f"s{k-1}"], acc[f"p{k-1}"]
            ok = (
                (e["idx"] == k)
                & ~frz_e
                & sp.isNotNull()
                & (e["ts"] <= sp + F.lit(win))
            )
            if s_inc:
                ok = ok & (e["ts"] > pp)
            starts.append(F.when(ok, sp).otherwise(acc[f"s{k}"]).alias(f"s{k}"))
            lasts.append(F.when(ok, e["ts"]).otherwise(acc[f"p{k}"]).alias(f"p{k}"))
        return F.struct(*starts, *lasts, frz_e.alias("frz"))

    def finish(acc: Column) -> Column:
        level = F.lit(0)
        for k in range(1, n + 1):
            level = F.when(acc[f"s{k}"].isNotNull(), k).otherwise(level)
        return level

    return grouped.select(
        "user", F.aggregate("evs", zero, merge, finish).cast("int").alias("level")
    )


def _seq_fold(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    conds: Sequence[Column],
    max_gaps: Sequence[int | None] | None,
    count_mode: bool,
) -> DataFrame:
    """Shared DP fold for sequenceMatch/sequenceCount with `(?t<=N)` gap
    constraints (`src/AggregateFunctions/AggregateFunctionSequenceMatch.h`;
    pattern ops at `:66-85`).

    Per level k the accumulator keeps the LATEST timestamp reaching k —
    optimal for `<=` gap constraints (events arrive time-sorted, and a later
    level-(k-1) ts can only make the next gap smaller), so the linear fold
    finds a match whenever the reference's backtracking regex would. Only
    `(?t<=N)` constraints are supported — `(?t>N)` would need the earliest
    ts instead (raise rather than silently mis-evaluate).

    count_mode: on completing level n, increment and reset all levels — the
    reference's non-overlapping chain counting.
    """
    n = len(conds)
    gaps = list(max_gaps) if max_gaps is not None else [None] * (n - 1)
    if len(gaps) != n - 1:
        raise ValueError(f"need {n - 1} gap constraints, got {len(gaps)}")
    ent = _entries(df, ts_col, user_col, conds)
    grouped = ent.groupBy("user").agg(F.array_sort(F.collect_list("e")).alias("evs"))

    nulll = F.lit(None).cast("long")
    zero = F.struct(
        *[nulll.alias(f"l{k}") for k in range(1, n + 1)],
        F.lit(0).alias("cnt"),
    )

    def merge(acc: Column, e: Column) -> Column:
        oks = [e["idx"] == 1]
        for k in range(2, n + 1):
            prev = acc[f"l{k-1}"]
            ok = (e["idx"] == k) & prev.isNotNull()
            g = gaps[k - 2]
            if g is not None:
                ok = ok & (e["ts"] - prev <= F.lit(int(g) * 1_000_000))
            oks.append(ok)
        completed = oks[n - 1] if count_mode else F.lit(False)
        fields = []
        for k in range(1, n + 1):
            # store the achieving event's ts at level k (the gap constraint
            # compares against the previous level's stored ts)
            val = F.when(oks[k - 1], e["ts"]).otherwise(acc[f"l{k}"])
            if count_mode:
                val = F.when(completed, nulll).otherwise(val)
            fields.append(val.alias(f"l{k}"))
        cnt = F.when(completed, acc["cnt"] + 1).otherwise(acc["cnt"])
        return F.struct(*fields, cnt.alias("cnt"))

    def finish(acc: Column) -> Column:
        if count_mode:
            return acc["cnt"]
        return acc[f"l{n}"].isNotNull().cast("int")

    out_name = "n_matches" if count_mode else "matched"
    return grouped.select(
        "user", F.aggregate("evs", zero, merge, finish).cast("int").alias(out_name)
    )


def sequence_match_t(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    conds: Sequence[Column],
    max_gaps: Sequence[int | None] | None = None,
) -> DataFrame:
    """sequenceMatch('(?1)(?t<=g1)(?2)...') — gap-constrained ordered
    subsequence match (see _seq_fold)."""
    return _seq_fold(df, ts_col, user_col, conds, max_gaps, count_mode=False)


def sequence_count(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    conds: Sequence[Column],
    max_gaps: Sequence[int | None] | None = None,
) -> DataFrame:
    """sequenceCount — number of non-overlapping gap-constrained chains
    (see _seq_fold)."""
    return _seq_fold(df, ts_col, user_col, conds, max_gaps, count_mode=True)


def sequence_next_node(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    event_col: str,
    conds: Sequence[Column],
    direction: str = "forward",
    base: str = "first_match",
    base_cond: Column | None = None,
) -> DataFrame:
    """sequenceNextNode(direction, base)(ts, event, base_cond, e1, e2, ...) —
    the value of the event adjacent to a CONSECUTIVE matched chain
    (`src/AggregateFunctions/AggregateFunctionSequenceNextNode.h`:
    getBaseIndex :336-370, getNextNodeIndex :374-408).

    Semantics replicated exactly:
      - events sorted by (ts, event value) — the reference's Node::compare
        tie-break at equal timestamps (:128-149);
      - base ∈ head | tail | first_match | last_match picks the chain start
        (head/tail additionally require ``base_cond`` on that row;
        first/last_match scan for a row matching ``conds[0]`` AND base_cond);
      - forward: rows base..base+n-1 must match conds 0..n-1 IN A ROW; the
        result is row base+n's event value (NULL when absent). backward walks
        base..base-n+1 and returns row base-n's value;
      - a user with ≤ n events yields NULL (:379-380).

    Returns (user, next_node). One groupBy shuffle; the scan over the sorted
    per-user array is a pure codegen expression (try_element_at guards every
    index), no Python.
    """
    n = len(conds)
    if n == 0:
        raise ValueError("sequence_next_node needs at least one event condition")
    if n > 31:
        raise ValueError("at most 31 event conditions (bitmask width)")
    if direction not in ("forward", "backward"):
        raise ValueError(f"direction must be forward|backward, got {direction!r}")
    if base not in ("head", "tail", "first_match", "last_match"):
        raise ValueError(
            f"base must be head|tail|first_match|last_match, got {base!r}"
        )
    cb = base_cond if base_cond is not None else F.lit(True)
    mask = None
    for i, c in enumerate(conds):
        term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
        mask = term if mask is None else (mask + term)
    e = F.struct(
        F.unix_micros(F.col(ts_col)).alias("ts"),
        F.col(event_col).alias("ev"),
        mask.cast("int").alias("m"),
        cb.alias("cb"),
    )
    grouped = df.groupBy(F.col(user_col).alias("user")).agg(
        F.array_sort(F.collect_list(e)).alias("evs")
    )

    evs = F.col("evs")
    m = F.size(evs)

    def bit(idx: Column, j: int) -> Column:
        el = F.try_element_at(evs, idx.cast("int"))
        return F.coalesce(
            F.shiftright(el["m"], j).bitwiseAND(F.lit(1)) == 1, F.lit(False)
        )

    def cbase(idx: Column) -> Column:
        el = F.try_element_at(evs, idx.cast("int"))
        return F.coalesce(el["cb"], F.lit(False))

    if base == "head":
        b = F.when(cbase(F.lit(1)), F.lit(1))
    elif base == "tail":
        b = F.when(cbase(m), m)
    else:
        matches = F.filter(
            F.sequence(F.lit(1), m),
            lambda i: bit(i, 0) & cbase(i),
        )
        b = (
            F.get(matches, 0)
            if base == "first_match"
            else F.when(F.size(matches) > 0, F.element_at(matches, F.size(matches)))
        )

    sign = 1 if direction == "forward" else -1
    ok = F.lit(True)
    for j in range(n):
        idx = b + F.lit(sign * j)
        ok = ok & (idx >= 1) & (idx <= m) & bit(idx, j)
    ridx = b + F.lit(sign * n)
    result = F.when(
        b.isNotNull() & (m > n) & ok & (ridx >= 1) & (ridx <= m),
        F.try_element_at(evs, ridx.cast("int"))["ev"],
    )
    return grouped.select("user", result.alias("next_node"))
