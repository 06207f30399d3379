"""Round-11 queries: new operators land here so they register inside the
driver's first-50 CORRECTNESS window (registration order = import order in
plans/queries.py; this module is imported right after llm_pipeline).

Certified blocks migrate out of the window at the NEXT round's fold by
moving this module's import to the parked-last section (the r10 pattern) —
never edit a block after its round's CORRECTNESS file is recorded without
re-entering the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_consumer_spark.plans.queries import (
    _t,
    register,
)
