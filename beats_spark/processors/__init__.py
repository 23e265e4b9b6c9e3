"""Processor registry. Importing this package registers every stage."""

from beats_spark.processors.base import (  # noqa: F401
    IfThenElseStage,
    Stage,
    WhenStage,
    apply_chain,
    build_chain,
    build_stage,
    register,
)

# register all built-in processors
from beats_spark.processors import actions  # noqa: F401,E402
from beats_spark.processors import convert  # noqa: F401,E402
from beats_spark.processors import dissect  # noqa: F401,E402
from beats_spark.processors import domain  # noqa: F401,E402
from beats_spark.processors import enrich  # noqa: F401,E402
from beats_spark.processors import fingerprint  # noqa: F401,E402
from beats_spark.processors import flowhash  # noqa: F401,E402
from beats_spark.processors import grok  # noqa: F401,E402
from beats_spark.processors import kv  # noqa: F401,E402
from beats_spark.processors import misc  # noqa: F401,E402
from beats_spark.processors import script  # noqa: F401,E402
from beats_spark.processors import stateful  # noqa: F401,E402
from beats_spark.processors import syslog  # noqa: F401,E402
from beats_spark.processors import uaparse  # noqa: F401,E402
