"""Schemas of the reference's sources and sinks, as Spark StructTypes.

Extracted from:
- booking change-feed doc: /root/reference/dataset/BookingDataCosmosDB.json:10-72
  and /root/reference/dataflow/BookingDataTransformation.json:55-67
  (dates arrive as STRINGS; property_location is a nested struct)
- bookings fact: /root/reference/dataflow/BookingDataTransformation.json:73-90
  and /root/reference/synapse_table_creation.sql:30-47
- customer dim: /root/reference/dataset/CustomerDataSynapse.json and
  /root/reference/synapse_table_creation.sql:6-24
- gold aggregate: /root/reference/synapse_table_creation.sql:56-69
"""

from __future__ import annotations

from pyspark.sql import types as T

# Cosmos change-feed booking document (string-first ingestion; cast later —
# mirrors allowSchemaDrift:true / validateSchema:false semantics).
BOOKING_DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("booking_id", T.StringType()),
        T.StructField("property_id", T.StringType()),
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("owner_id", T.StringType()),
        T.StructField("check_in_date", T.StringType()),   # 'yyyy-MM-dd'
        T.StructField("check_out_date", T.StringType()),  # 'yyyy-MM-dd'
        T.StructField("booking_date", T.StringType()),    # 'yyyy-MM-dd HH:mm:ss'
        T.StructField("amount", T.DoubleType()),
        T.StructField("currency", T.StringType()),
        T.StructField(
            "property_location",
            T.StructType(
                [
                    T.StructField("city", T.StringType()),
                    T.StructField("country", T.StringType()),
                ]
            ),
        ),
        T.StructField("timestamp", T.StringType()),       # 'yyyy-MM-dd HH:mm:ss'
    ]
)

# Silver fact table — the 16-column sink schema
# (/root/reference/dataflow/BookingDataTransformation.json:158-175).
BOOKINGS_FACT_SCHEMA = T.StructType(
    [
        T.StructField("booking_id", T.StringType()),
        T.StructField("property_id", T.StringType()),
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("owner_id", T.StringType()),
        T.StructField("check_in_date", T.DateType()),
        T.StructField("check_out_date", T.DateType()),
        T.StructField("stay_duration", T.LongType()),
        T.StructField("booking_date", T.TimestampType()),
        T.StructField("booking_year", T.IntegerType()),
        T.StructField("booking_month", T.IntegerType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("currency", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("full_address", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

# Customer dimension — SCD Type 1 target
# (/root/reference/synapse_table_creation.sql:6-24; 17 columns).
CUSTOMER_DIM_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone_number", T.StringType()),
        T.StructField("address_line1", T.StringType()),
        T.StructField("address_line2", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("zip_code", T.StringType()),
        T.StructField("signup_date", T.DateType()),
        T.StructField("last_login", T.TimestampType()),
        T.StructField("total_spent", T.DecimalType(10, 2)),
        T.StructField("preferred_language", T.StringType()),
        T.StructField("loyalty_tier", T.StringType()),
        T.StructField("is_active", T.StringType()),
    ]
)

# Gold aggregate (/root/reference/synapse_table_creation.sql:56-69).
BOOKING_AGG_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType()),
        T.StructField("total_bookings", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("last_booking_date", T.TimestampType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
