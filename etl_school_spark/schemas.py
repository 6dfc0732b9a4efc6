"""Explicit StructType schemas for every data shape the reference processes
(FIXTURES.md; DDL at reference commands.sql:32-62, A4:316-328, A4:95-97).

Schema-on-read is always explicit here — the reference never infers schemas
(SURVEY.md §1.3), and neither do we: inference costs a full extra pass at
scale and silently drifts.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# client_buy_orders fact table (commands.sql:32-48; generator record
# data_generator.py:38-54). VARIANT columns are typed structs end-to-end.
ADDRESS = StructType(
    [
        _f("street_address", StringType()),
        _f("city", StringType()),
        _f("state", StringType()),
        _f("postalcode", StringType()),
    ]
)

EMERGENCY_CONTACT = StructType([_f("name", StringType()), _f("phone", StringType())])

CLIENT_BUY_ORDERS = StructType(
    [
        _f("txid", StringType(), False),
        _f("rfid", StringType(), False),
        _f("car_model", StringType(), False),
        _f("brand", StringType(), False),
        _f("engine", StringType(), False),
        _f("horsepower", LongType(), False),
        _f("sell_price", LongType(), False),
        _f("purchase_time", TimestampNTZType(), False),
        _f("days", LongType(), False),
        _f("name", StringType(), False),
        _f("address", ADDRESS),
        _f("phone", StringType()),
        _f("email", StringType()),
        _f("emergency_contact", EMERGENCY_CONTACT),
    ]
)

# car_details dimension (commands.sql:50-62)
CAR_DETAILS = StructType(
    [
        _f("txid", StringType(), False),
        _f("car_model", StringType(), False),
        _f("brand", StringType(), False),
        _f("engine", StringType(), False),
        _f("horsepower", LongType(), False),
        _f("buy_price", LongType(), False),
        _f("type", StringType(), False),
        _f("autonomy", LongType()),
        _f("consumption", DoubleType()),
        _f("release_date", LongType()),
    ]
)

# credit-card event payload (A4:172-192); staged raw then flattened
CC_PAYLOAD = StructType(
    [
        _f("element", LongType()),
        _f("object", StringType()),
        _f(
            "transaction",
            StructType(
                [
                    _f("id", LongType()),
                    _f("type", StringType()),
                    _f("amount", DoubleType()),
                    _f("currency", StringType()),
                    _f("timestamp", StringType()),
                    _f("approved", BooleanType()),
                ]
            ),
        ),
        _f("card", StructType([_f("number", LongType())])),
        _f("merchant", StructType([_f("id", LongType())])),
    ]
)

# typed analytic table cc_trans_all (A4:316-328)
CC_TRANS_ALL = StructType(
    [
        _f("element", LongType()),
        _f("object_type", StringType()),
        _f("txn_id", LongType()),
        _f("txn_type", StringType()),
        _f("amount", DoubleType()),
        _f("currency", StringType()),
        _f("txn_ts", TimestampNTZType()),
        _f("approved", BooleanType()),
        _f("card_number", StringType()),
        _f("merchant_id", LongType()),
        _f("load_ts", TimestampNTZType()),
    ]
)

# the driver's events table (TESTDATA.md) as JSON-lines on a topic dir
EVENTS = StructType(
    [
        _f("event_id", LongType()),
        _f("ts", TimestampNTZType()),
        _f("user_id", LongType()),
        _f("event_type", StringType()),
        _f("value", DoubleType()),
        _f("props", StringType()),
    ]
)

# DQ metrics / alerts (A4:777-784, A4:874-880)
DQ_METRICS = StructType(
    [
        _f("metric_group", StringType()),
        _f("metric_name", StringType()),
        _f("metric_value", DoubleType()),
        _f("metric_den", DoubleType()),
        _f("computed_at", TimestampNTZType()),
    ]
)

DQ_ALERTS = StructType(
    [
        _f("alert_time", TimestampNTZType()),
        _f("metric_name", StringType()),
        _f("metric_value", DoubleType()),
        _f("threshold", DoubleType()),
        _f("note", StringType()),
    ]
)
