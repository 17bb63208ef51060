"""The Debezium invoices CDC scenario — fixture rows reproducing the
reference's demo corpus (demo/batch-1..4.zson, FIXTURES.md §2) under the
unified envelope schema (SURVEY §1.2): per-topic value shapes are
union-widened with nulls into one pool schema.
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ROW_SCHEMA = StructType(
    [
        StructField(
            "kafka",
            StructType(
                [
                    StructField("topic", StringType()),
                    StructField("partition", LongType()),
                    StructField("offset", LongType()),
                ]
            ),
        ),
        StructField("key", StructType([StructField("ID", LongType())])),
        StructField(
            "value",
            StructType(
                [
                    StructField("op", StringType()),
                    StructField(
                        "before",
                        StructType(
                            [
                                StructField("ID", LongType()),
                                StructField("customer", StringType()),
                                StructField("item", StringType()),
                            ]
                        ),
                    ),
                    StructField(
                        "after",
                        StructType(
                            [
                                StructField("ID", LongType()),
                                StructField("customer", StringType()),
                                StructField("item", StringType()),
                                StructField("InvoiceID", LongType()),
                                StructField("status", StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        StructField("zed_type", StringType()),
    ]
)


def _inv(offset, op, id_, customer, item):
    return (
        ("Invoices", 0, offset),
        (id_,),
        (op, None, (id_, customer, item, None, None)),
        "data",
    )


def _status(offset, op, id_, invoice_id, status):
    return (
        ("InvoiceStatus", 0, offset),
        (id_,),
        (op, None, (id_, None, None, invoice_id, status)),
        "data",
    )


# demo/batch-1.zson
BATCH_1 = [
    _inv(1, "r", 100, "Alice", "taco"),
    _inv(2, "r", 101, "Bob", "burrito"),
    _status(1, "r", 80, 101, "pending"),
    _status(2, "r", 32, 100, "pending"),
]

# demo/batch-2.zson
BATCH_2 = [
    _inv(3, "c", 102, "Charlie", "enchilada"),
    _inv(4, "c", 103, "Dan", "beans"),
    _status(3, "c", 77, 102, "pending"),
]

# demo/batch-3.zson
BATCH_3 = [
    _status(4, "c", 192, 103, "pending"),
    _status(5, "u", 32, 100, "closed"),
]

# demo/batch-4.zson
BATCH_4 = [
    _status(6, "u", 192, 103, "collections"),
    _status(7, "u", 77, 102, "paid"),
    _status(8, "u", 80, 101, "paid"),
]

BATCHES = [BATCH_1, BATCH_2, BATCH_3, BATCH_4]

INVOICES_YAML = """
inputs:
  - topic: Invoices
    pool: Raw
  - topic: InvoiceStatus
    pool: Raw

output:
  topic: NewInvoices
  pool: Staging

transforms:
  - type: denorm
    where: value.op in ["c", "r"]
    left: Invoices
    right: InvoiceStatus
    join-on: left.value.after.ID=right.value.after.InvoiceID
    out: NewInvoices
    zed: |
      | out:={
          key: left.key,
          value: {
            ID: left.value.after.ID,
            customer: left.value.after.customer,
            item: left.value.after.item,
            invoice_status: right.value.after.status
          }
        }
  - type: stateless
    where: value.op=="u"
    in: InvoiceStatus
    out: NewInvoices
    zed: |
      | out:={
          key: {
            ID: in.value.after.InvoiceID
          },
          value: {
            ID: in.value.after.InvoiceID,
            invoice_status: in.value.after.status
          }
        }
  - type: stateless
    where: value.op=="u"
    in: Invoices
    out: NewInvoices
    zed: |
      | out:={
          key: in.key,
          value: in.value.after
        }
  - type: stateless
    where: value.op=="d"
    in: Invoices
    out: NewInvoices
    zed: |
      | out:={
          key: in.key,
          value: cast(null, typeof(in.value.before))
        }
"""

# Expected Staging contents after each batch, from ztests/etl-demo.yaml:28-90.
# data rows: (offset, key_id, value_id, customer, item, invoice_status)
# done markers: (topic, offset)
GOLDEN_DATA = {
    1: [
        (0, 100, 100, "Alice", "taco", "pending"),
        (1, 101, 101, "Bob", "burrito", "pending"),
    ],
    2: [
        (2, 102, 102, "Charlie", "enchilada", "pending"),
    ],
    3: [
        (3, 103, 103, "Dan", "beans", "pending"),
        (4, 100, 100, None, None, "closed"),
    ],
    4: [
        (5, 103, 103, None, None, "collections"),
        (6, 102, 102, None, None, "paid"),
        (7, 101, 101, None, None, "paid"),
    ],
}

GOLDEN_DONE = {
    1: [("Invoices", 1), ("Invoices", 2), ("InvoiceStatus", 1), ("InvoiceStatus", 2)],
    2: [("Invoices", 3), ("InvoiceStatus", 3)],  # Dan (Invoices,4) stays pending
    3: [("Invoices", 4), ("InvoiceStatus", 4), ("InvoiceStatus", 5)],
    4: [("InvoiceStatus", 6), ("InvoiceStatus", 7), ("InvoiceStatus", 8)],
}
