"""Query inventory — every operator declared in SURVEY.md §2.

Importing this package populates ``REGISTRY`` (see ``base.py``);
``__spark_entry__.py`` exposes it to the driver.
"""

from cdc_spark.queries.base import REGISTRY, QuerySpec, register

# Import side effects: each module registers its queries.
from cdc_spark.queries import relational  # noqa: E402,F401
from cdc_spark.queries import relational2  # noqa: E402,F401
from cdc_spark.queries import relational3  # noqa: E402,F401
from cdc_spark.queries import temporal_queries  # noqa: E402,F401
from cdc_spark.queries import cdc_queries  # noqa: E402,F401
from cdc_spark.queries import text_queries  # noqa: E402,F401
from cdc_spark.queries import dedup_queries  # noqa: E402,F401
from cdc_spark.queries import packing_queries  # noqa: E402,F401
from cdc_spark.queries import similarity_queries  # noqa: E402,F401
from cdc_spark.queries import multimodal_queries  # noqa: E402,F401
from cdc_spark.queries import pandas_udf_queries  # noqa: E402,F401
from cdc_spark.queries import streaming_queries  # noqa: E402,F401
from cdc_spark.queries import io_queries  # noqa: E402,F401
from cdc_spark.queries import sketch_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
