"""Physical-plan audit — asserts the plan properties the 100 TB design
depends on, so perf regressions fail tests instead of shipping:

  - filters reach the parquet scan (PushedFilters),
  - top-k compiles to TakeOrderedAndProject (per-partition k, no full sort),
  - small dims broadcast (BroadcastHashJoin),
  - hot paths stay in codegen (no BatchEvalPython/ArrowEval stages),
  - partition pruning fires for partitioned artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    p = plan_string(df)
    assert "PushedFilters: [" in p and fragment in p, (
        f"expected pushed filter containing {fragment!r};\n{p[:2000]}"
    )


def assert_take_ordered(df: DataFrame) -> None:
    p = plan_string(df)
    assert "TakeOrderedAndProject" in p, f"top-k not TakeOrderedAndProject;\n{p[:2000]}"


def assert_broadcast_join(df: DataFrame) -> None:
    p = plan_string(df)
    assert "BroadcastHashJoin" in p, f"expected broadcast join;\n{p[:2000]}"


def assert_no_python_in_plan(df: DataFrame) -> None:
    p = plan_string(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in p, f"python row boundary in hot path ({marker});\n{p[:2000]}"


def assert_partition_pruned(df: DataFrame, partition_col: str) -> None:
    p = plan_string(df)
    assert "PartitionFilters" in p and partition_col in p, (
        f"expected partition pruning on {partition_col};\n{p[:2000]}"
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages. The compact plan string marks
    codegen operators with '*(N)'; count distinct stage ids."""
    import re

    p = plan_string(df)
    return len(set(re.findall(r"\*\((\d+)\)", p))) or p.count("WholeStageCodegen")
