"""Multi-column / descending ORDER BY ... WITH FILL — the full
FillingTransform semantics.

Reference: `src/Processors/Transforms/FillingTransform.cpp` +
`src/Interpreters/FillingRow.cpp` (the mixed-radix odometer).  Observable
behavior (pinned by 00995_order_by_with_fill):

- each fill column has a direction, optional FROM / TO bounds and a STEP
  (default = the direction); TO is EXCLUSIVE, FROM is emitted itself when
  it precedes the first value;
- within a prefix-group (fixed values of the fill columns before it), a
  column's fill grid is an arithmetic progression anchored ONCE — at FROM
  when given, else at the group's first original value — so off-grid
  originals interleave without re-anchoring the grid;
- fill rows inserted by an outer column carry FROM for the inner columns
  when given (and then enumerate to the inner TO), else a single row with
  the inner column unset (rendered as the column default by the SQL
  surface, NULL by this API);
- trailing fill past a group's last original value happens only under an
  explicit TO; leading fill before the first value only under FROM.

Spark design: ONE sort by the fill tuple; lag/first_value/row_number
windows attach each row's gap context (previous tuple, per-level grid
anchors, rank); a mapInPandas generator then emits every gap's fill rows
independently — gaps don't interact, so generation is Arrow-batched and
embarrassingly parallel.  The windows run over the global sort like the
reference's own single-stream FillingTransform; fill output is
result-scale, never data-scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone
from typing import Any, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class FillSpec:
    """One ORDER BY item with WITH FILL (FillDescription analog)."""

    col: str
    descending: bool = False
    from_value: Any = None
    to_value: Any = None
    step: Any = None  # None -> 1 in column units, signed by direction

    @property
    def direction(self) -> int:
        return -1 if self.descending else 1


class InvalidFillError(ValueError):
    """serverError 475 (INVALID_WITH_FILL_EXPRESSION) analog."""


def validate_spec(spec: FillSpec, ch_type: str | None = None) -> None:
    """The reference's transformWithFill checks (475 cases pinned by
    00995): STEP must be non-zero and agree with the sort direction;
    FROM/TO must be ordered along the direction; FROM must fit the
    column's declared CH type (negative FROM on UInt*)."""
    d = spec.direction
    if spec.step is not None:
        s = spec.step
        sv = s.days if isinstance(s, timedelta) else s
        if sv == 0 or (sv > 0) != (d > 0):
            raise InvalidFillError(
                f"WITH FILL STEP {s!r} contradicts the ORDER BY direction "
                "(INVALID_WITH_FILL_EXPRESSION, serverError 475)"
            )
    if spec.from_value is not None and spec.to_value is not None:
        f, t = spec.from_value, spec.to_value
        try:
            wrong = (f > t) if d > 0 else (f < t)
        except TypeError:
            wrong = False
        if wrong:
            raise InvalidFillError(
                "WITH FILL FROM/TO bounds contradict the ORDER BY "
                "direction (serverError 475)"
            )
    if (
        ch_type
        and ch_type.lower().startswith("uint")
        and spec.from_value is not None
        and spec.from_value < 0
    ):
        raise InvalidFillError(
            f"WITH FILL FROM {spec.from_value} is out of range for "
            f"{ch_type} (serverError 475)"
        )


# --- value codecs: fill arithmetic runs on plain numbers ------------------

_EPOCH = date(1970, 1, 1)


def _enc(v: Any) -> Any:
    if isinstance(v, datetime):
        return int(v.replace(tzinfo=timezone.utc).timestamp())
    if isinstance(v, date):
        return (v - _EPOCH).days
    return v


def _dec(v: Any, kind: str) -> Any:
    if v is None:
        return None
    if kind == "date":
        return _EPOCH + timedelta(days=int(v))
    if kind == "timestamp":
        return datetime.fromtimestamp(int(v), tz=timezone.utc).replace(tzinfo=None)
    if kind == "int":
        return int(v)
    return v


def _kind(dtype: str) -> str:
    if dtype == "date":
        return "date"
    if dtype == "timestamp":
        return "timestamp"
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    return "num"


def _step_units(spec: FillSpec, kind: str) -> float:
    s = spec.step
    if s is None:
        return float(spec.direction)
    if isinstance(s, timedelta):
        return s.total_seconds() if kind == "timestamp" else s.days
    return float(s)


# --- the FillingRow odometer, ported exactly -------------------------------


def _less(a: float, b: float, d: int) -> bool:
    return b < a if d < 0 else a < b


class _FillingRow:
    """FillingRow.cpp port: `row` holds the current fill tuple (None =
    unset); next() advances it toward `to_row`, returning True when a fill
    row should be emitted."""

    def __init__(self, descs: list[dict]):
        self.descs = descs
        self.row: list = [None] * len(descs)

    def less_row(self, other: list) -> bool:
        for i, d in enumerate(self.descs):
            a, b = self.row[i], other[i]
            if a is None or b is None or a == b:
                continue
            return _less(a, b, d["dir"])
        return False

    def init_from_defaults(self, from_pos: int) -> None:
        for i in range(from_pos, len(self.row)):
            self.row[i] = self.descs[i]["from"]

    def next(self, to_row: list) -> bool:
        descs, row = self.descs, self.row
        size = len(row)
        pos = 0
        while pos < size and not (
            row[pos] is not None
            and to_row[pos] is not None
            and row[pos] != to_row[pos]
        ):
            pos += 1
        if pos == size or _less(to_row[pos], row[pos], descs[pos]["dir"]):
            return False
        for i in range(size - 1, pos, -1):
            if descs[i]["to"] is None or row[i] is None:
                continue
            nxt = row[i] + descs[i]["step"]
            if _less(nxt, descs[i]["to"], descs[i]["dir"]):
                row[i] = nxt
                self.init_from_defaults(i + 1)
                return True
        nxt = row[pos] + descs[pos]["step"]
        if _less(to_row[pos], nxt, descs[pos]["dir"]) or (
            descs[pos]["to"] is not None and nxt == descs[pos]["to"]
        ):
            return False
        row[pos] = nxt
        if row[pos] == to_row[pos]:
            is_less = False
            for i in range(pos + 1, size):
                frm = descs[i]["from"]
                row[i] = frm if frm is not None else to_row[i]
                if row[i] is not None and to_row[i] is not None:
                    is_less |= _less(row[i], to_row[i], descs[i]["dir"])
            return is_less
        self.init_from_defaults(pos + 1)
        return True



def _clamp(vals: list, descs: list[dict]) -> list:
    """next_row construction: originals beyond TO are clamped to TO."""
    return [
        (
            d["to"]
            if v is not None
            and d["to"] is not None
            and not _less(v, d["to"], d["dir"])
            else v
        )
        for v, d in zip(vals, descs)
    ]


def _tuple_less(a: list, b: list, descs: list[dict]) -> bool:
    for i, d in enumerate(descs):
        if a[i] is None or b[i] is None or a[i] == b[i]:
            continue
        return _less(a[i], b[i], d["dir"])
    return False


class _FillingMachine:
    """FillingTransform::transform ported 1:1 — feed sorted original rows'
    fill tuples through on_row() (returns the fill tuples to insert BEFORE
    the original), then finish() for the TO-bound suffix."""

    def __init__(self, descs: list[dict]):
        self.descs = descs
        self.fr = _FillingRow(descs)
        self.next_row: list = [None] * len(descs)
        self.first = True

    def on_row(self, vals: list) -> list[list]:
        out: list[list] = []
        descs, fr = self.descs, self.fr
        if self.first:
            # the first-chunk block (FillingTransform.cpp:434-451)
            for i, d in enumerate(descs):
                v = vals[i]
                if d["from"] is not None and v != d["from"]:
                    fr.init_from_defaults(i)
                    if _less(d["from"], v, d["dir"]):
                        out.append(list(fr.row))
                    break
                fr.row[i] = v
            self.first = False
        # stale next_row (the previous row's) vs the re-initialized
        # filling_row decides should_insert_first (FillingTransform.cpp:456)
        sif = _tuple_less(self.next_row, fr.row, descs)
        self.next_row = _clamp(vals, descs)
        if sif and _tuple_less(fr.row, self.next_row, descs):
            out.append(list(fr.row))
        while fr.next(self.next_row):
            out.append(list(fr.row))
        return out

    def finish(self) -> list[list]:
        """generate_suffix: fill toward the TO bounds after the last row
        (FillingTransform::prepare + the generate_suffix transform block)."""
        out: list[list] = []
        descs, fr = self.descs, self.fr
        sif = _tuple_less(self.next_row, fr.row, descs) or self.first
        self.next_row = [d["to"] for d in descs]
        if not (self.first or _tuple_less(fr.row, self.next_row, descs)):
            return out
        if self.first:
            fr.init_from_defaults(0)
        if sif and _tuple_less(fr.row, self.next_row, descs):
            out.append(list(fr.row))
        while fr.next(self.next_row):
            out.append(list(fr.row))
        return out


def with_fill_multi(
    df: DataFrame,
    specs: list[FillSpec],
    extra_order: list[tuple[str, bool]] | None = None,
    keep_marker: bool = False,
    keep_seq: bool = False,
) -> DataFrame:
    """Densify several ORDER BY axes at once (and/or descending axes) with
    the reference's exact FillingTransform semantics.  Fill rows carry
    NULL in the non-fill columns (callers apply column defaults — the SQL
    surface does).  ``extra_order`` appends non-fill (col, descending)
    sort items after the fill columns (`ORDER BY d WITH FILL, v`);
    ``keep_marker`` keeps a boolean ``_wfm_orig`` column marking original
    rows (the SQL surface uses it to apply column defaults); ``keep_seq``
    keeps a ``_wfm_seq`` long numbering output rows in emission order (the
    SQL surface's INTERPOLATE windows order by it — r8).

    Plan: ONE global sort, then the ported FillingTransform machine runs
    over it in a single stream (mapInPandas on one partition, state kept
    across Arrow batches) — exactly the reference's own execution shape:
    FillingTransform is a single-stream ISimpleTransform, and fill output
    is result-scale, never data-scale.  The single-column ascending SQL
    form keeps the fully-distributed grid-join rewrite."""
    for spec in specs:
        validate_spec(spec)
    fill_cols = [s.col for s in specs]
    other_cols = [c for c in df.columns if c not in fill_cols]
    dtypes = dict(df.dtypes)
    kinds = [_kind(dtypes[s.col]) for s in specs]
    descs = [
        {
            "dir": s.direction,
            "from": _enc(s.from_value),
            "to": _enc(s.to_value),
            "step": _step_units(s, k),
        }
        for s, k in zip(specs, kinds)
    ]
    order = [
        F.col(s.col).desc() if s.descending else F.col(s.col).asc()
        for s in specs
    ] + [
        F.col(c).desc() if dsc else F.col(c).asc()
        for c, dsc in (extra_order or [])
    ]

    n_f = len(specs)
    out_fields = (
        [(s.col, dtypes[s.col]) for s in specs]
        + [(c, dtypes[c]) for c in other_cols]
        + [("_wfm_orig", "boolean"), ("_wfm_seq", "bigint")]
    )
    out_schema = ", ".join(f"`{n}` {t}" for n, t in out_fields)
    cols_in_order = [n for n, _ in out_fields]

    def gen(batches):
        import pandas as pd

        machine = _FillingMachine(descs)
        seq = [0]

        def fill_rec(tup):
            rec = {
                s.col: _dec(tup[i], kinds[i]) for i, s in enumerate(specs)
            }
            rec.update({c: None for c in other_cols})
            rec["_wfm_orig"] = False
            seq[0] += 1
            rec["_wfm_seq"] = seq[0]
            return rec

        def frame(rows):
            if rows:
                return pd.DataFrame(rows, columns=cols_in_order)
            return pd.DataFrame(
                {n: pd.Series(dtype="object") for n in cols_in_order}
            )

        for pdf in batches:
            rows_out: list[dict] = []
            for _, r in pdf.iterrows():
                cur = [_enc(r[s.col]) for s in specs]
                for tup in machine.on_row(cur):
                    rows_out.append(fill_rec(tup))
                orig = {s.col: r[s.col] for s in specs}
                orig.update({c: r[c] for c in other_cols})
                orig["_wfm_orig"] = True
                seq[0] += 1
                orig["_wfm_seq"] = seq[0]
                rows_out.append(orig)
            yield frame(rows_out)
        yield frame([fill_rec(t) for t in machine.finish()])

    filled = (
        df.orderBy(*order).coalesce(1).mapInPandas(gen, schema=out_schema)
    )
    keep = (
        [*fill_cols, *other_cols]
        + (["_wfm_orig"] if keep_marker else [])
        + (["_wfm_seq"] if keep_seq else [])
    )
    return filled.select(*keep)
