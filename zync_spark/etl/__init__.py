"""The CDC ETL compiler: declarative YAML transform specs compiled into
DataFrame pipelines executed transactionally against pools.

Reference: `zync etl` (etl/build.go:20-216, README.md:180-403). The
reference compiles YAML to a Zed query *string* and ships it to the lake
engine; here the same YAML compiles directly to a Catalyst logical plan.
"""

from zync_spark.etl.config import Transform, load_config  # noqa: F401
from zync_spark.etl.compile import EtlPipeline  # noqa: F401
