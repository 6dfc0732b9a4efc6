"""Batch ingest tests: JSON-lines reader, corrupt capture, copy_into."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from etl_school_spark.schemas import CLIENT_BUY_ORDERS


def _write_orders_json(spark, path, n=25, corrupt=0):
    from etl_school_spark.sources.generator import gen_buy_orders

    rows = gen_buy_orders(spark, n).collect()
    with open(path, "w") as fh:
        for r in rows:
            d = r.asDict(recursive=True)
            d["purchase_time"] = d["purchase_time"].isoformat()
            fh.write(json.dumps(d) + "\n")
        for i in range(corrupt):
            fh.write("{this is not json%d\n" % i)
    return n


def test_read_json_lines_with_corrupt_capture(spark, tmp_path):
    from etl_school_spark.sources.readers import read_json_lines, split_corrupt

    p = str(tmp_path / "orders.json")
    _write_orders_json(spark, p, n=20, corrupt=3)
    df = read_json_lines(spark, p, CLIENT_BUY_ORDERS)
    good, bad = split_corrupt(df)
    assert good.count() == 20
    assert bad.count() == 3
    # nested optional structs survive with nulls intact
    assert good.filter(F.col("address").isNotNull()).count() > 0
    assert good.filter(F.col("address.city").isNotNull()).count() > 0


def test_read_gzip_json(spark, tmp_path):
    """S19: .json.gz replay files read natively."""
    from etl_school_spark.sources.readers import read_json_lines, split_corrupt

    plain = str(tmp_path / "orders.json")
    _write_orders_json(spark, plain, n=15)
    gz = str(tmp_path / "orders.json.gz")
    with open(plain, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    good, _ = split_corrupt(read_json_lines(spark, gz, CLIENT_BUY_ORDERS))
    assert good.count() == 15


def test_copy_into_appends_and_purges(spark, tmp_path):
    from etl_school_spark.sources.writers import copy_into

    stage = str(tmp_path / "stage")
    target = str(tmp_path / "table")
    os.makedirs(stage)
    _write_orders_json(spark, os.path.join(stage, "batch_1.json"), n=10)
    _write_orders_json(spark, os.path.join(stage, "batch_2.json"), n=5)

    n = copy_into(spark, stage, target, CLIENT_BUY_ORDERS, pattern="batch_*.json")
    assert n == 15
    assert spark.read.parquet(target).count() == 15
    assert not [f for f in os.listdir(stage) if f.startswith("batch_")]  # purged

    # idempotent re-run: stage is empty, nothing loads
    assert copy_into(spark, stage, target, CLIENT_BUY_ORDERS, pattern="batch_*.json") == 0
    assert spark.read.parquet(target).count() == 15


def test_generator_deterministic_and_dimensional(spark):
    from etl_school_spark.sources.generator import car_catalog, gen_buy_orders

    a = gen_buy_orders(spark, 30).collect()
    b = gen_buy_orders(spark, 30).collect()
    assert [r.txid for r in a] == [r.txid for r in b]
    models = {r.car_model for r in a}
    catalog = {r.car_model for r in car_catalog(spark).collect()}
    assert models <= catalog
    # dimension lookup filled brand/horsepower/sell_price
    assert all(r.brand and r.horsepower and r.sell_price for r in a)


def test_copy_history_audit_and_rollup(spark, tmp_path):
    """copy_into with history_dir appends a copy_history row per load;
    rollup aggregates volumes (A4:706-712 analog)."""
    from etl_school_spark.schemas import CLIENT_BUY_ORDERS
    from etl_school_spark.sources.generator import gen_buy_orders
    from etl_school_spark.sources.writers import copy_history_rollup, copy_into

    stage = str(tmp_path / "stage")
    target = str(tmp_path / "orders")
    hist = str(tmp_path / "copy_history")
    for i in range(2):
        gen_buy_orders(spark, 30, seed=i).write.mode("overwrite").json(stage)
        n = copy_into(spark, stage, target, CLIENT_BUY_ORDERS, history_dir=hist)
        assert n == 30
    roll = copy_history_rollup(spark, hist).collect()
    assert len(roll) == 1
    assert roll[0].n_loads == 2 and roll[0].total_rows == 60
    assert roll[0].total_bytes > 0


def test_compaction_shrinks_files_keeps_data(spark, tmp_path):
    from etl_school_spark.sources.writers import compact_parquet_dir
    from etl_school_spark.tables import load_table

    table = str(tmp_path / "frag")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # simulate a streaming sink: many tiny files
    ev.repartition(40).write.parquet(table)
    before_count = spark.read.parquet(table).count()
    n_before, n_after = compact_parquet_dir(spark, table, target_file_mb=128)
    assert n_before >= 40 and n_after < n_before
    after = spark.read.parquet(table)
    assert after.count() == before_count


def test_conform_to_schema_evolution(spark):
    """Producers adding/reordering/dropping fields don't break the load."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etl_school_spark.sources.readers import conform_to_schema

    declared = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("extra_metric", LongType()),
        ]
    )
    evolved = spark.createDataFrame(
        [("7", "a", "surprise")], "id string, name string, new_field string"
    )
    out = conform_to_schema(evolved, declared)
    assert out.schema == declared
    row = out.collect()[0]
    assert row.id == 7 and row.name == "a" and row.extra_metric is None


def test_forget_keys_erasure(spark):
    from etl_school_spark.privacy import forget_keys
    from etl_school_spark.tables import load_table

    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    doomed = [r.c_custkey for r in cust.limit(5).collect()]
    out = forget_keys(cust, "c_custkey", doomed)
    assert out.count() == cust.count() - 5
    assert out.filter(out.c_custkey.isin(doomed)).count() == 0


def test_merge_upsert_replaces_and_appends(spark, tmp_path):
    from etl_school_spark.sources.writers import merge_upsert

    table = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    merge_upsert(spark, table, base, "id")
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    n_upd, total = merge_upsert(spark, table, updates, "id")
    assert (n_upd, total) == (2, 4)
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}
