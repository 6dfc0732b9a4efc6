"""Task-DAG orchestrator tests (T3–T7, T10)."""

from __future__ import annotations

import datetime


def test_dag_runs_in_dependency_order(spark, tmp_path):
    from etl_school_spark.orchestrate import TaskDag

    ran = []

    def job(name, n=1):
        def fn(s):
            ran.append(name)
            return n

        return fn

    dag = TaskDag(spark, str(tmp_path / "history"))
    dag.add("refine", job("refine"), after=["load"])
    dag.add("generate", job("generate"))
    dag.add("load", job("load"), after=["generate"])
    dag.add("wait_all", job("wait_all"), after=["refine", "audit"])
    dag.add("audit", job("audit"), after=["generate"])

    status = dag.run("r1")
    assert status == {n: "SUCCEEDED" for n in ["generate", "load", "refine", "audit", "wait_all"]}
    assert ran.index("generate") < ran.index("load") < ran.index("refine") < ran.index("wait_all")
    assert ran.index("audit") < ran.index("wait_all")


def test_dag_conditional_skip_and_failure_propagation(spark, tmp_path):
    from etl_school_spark.orchestrate import TaskDag

    def boom(s):
        raise RuntimeError("deliberate")

    dag = TaskDag(spark, str(tmp_path / "history"))
    dag.add("empty_stream", lambda s: 0)  # no data → SKIPPED (T4)
    dag.add("broken", boom)
    dag.add("downstream", lambda s: 1, after=["broken"])

    status = dag.run("r2")
    assert status["empty_stream"] == "SKIPPED"
    assert status["broken"] == "FAILED"
    assert status["downstream"] == "UPSTREAM_FAILED"

    h = dag.history()
    assert h.count() == 3
    assert h.filter("state = 'FAILED'").select("error").collect()[0].error


def test_task_monitoring_rollups(spark, tmp_path):
    from etl_school_spark.orchestrate import TaskDag

    dag = TaskDag(spark, str(tmp_path / "history"))
    dag.add("a", lambda s: 5)
    dag.add("b", lambda s: 3, after=["a"])
    dag.run("r1")
    dag.run("r2")

    dur = {r.task_name: r.n_runs for r in dag.task_durations().collect()}
    assert dur == {"a": 2, "b": 2}
    spans = dag.pipeline_span().collect()
    assert {r.run_id for r in spans} == {"r1", "r2"}
    assert all(r.span_sec >= 0 for r in spans)


def test_retention_sweep(spark, tmp_path):
    from etl_school_spark.orchestrate import retention_sweep

    table = str(tmp_path / "t")
    now = datetime.datetime(2026, 1, 1)
    rows = [(i, now - datetime.timedelta(days=i * 10)) for i in range(20)]
    spark.createDataFrame(rows, "id long, ts timestamp_ntz").write.parquet(table)

    kept = retention_sweep(spark, table, "ts", keep_days=90, now_ts=now.timestamp())
    assert kept == 10  # ids 0..9 are within 90 days
    assert spark.read.parquet(table).count() == 10


def test_partitioned_retention_drops_only_expired(spark, tmp_path):
    """Partition-drop retention: expired dt= dirs removed with no rewrite;
    date filters prune partitions in the scan."""
    from etl_school_spark.orchestrate import (
        retention_sweep_partitioned,
        write_date_partitioned,
    )
    from etl_school_spark.tables import load_table

    table = str(tmp_path / "events_part")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    write_date_partitioned(ev, table, "ts", mode="overwrite")

    dates = sorted(r.dt for r in spark.read.parquet(table).select("dt").distinct().collect())
    assert len(dates) > 2
    # cutoff: keep only the last 2 dates
    import datetime

    cutoff = dates[-2]
    now = datetime.datetime.combine(
        cutoff + datetime.timedelta(days=90), datetime.time(), datetime.UTC
    )
    dropped, kept = retention_sweep_partitioned(table, keep_days=90, now_ts=now.timestamp())
    assert dropped == len(dates) - 2 and kept == 2
    remaining = spark.read.parquet(table)
    assert sorted(r.dt for r in remaining.select("dt").distinct().collect()) == dates[-2:]

    # date predicate must prune partitions, not filter rows post-scan
    plan = remaining.filter(f"dt = DATE'{dates[-1]}'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]")[0]
    assert pf.strip(), "partition-filter list is empty — predicate not pruned"
