from openmatch_spark.plans.explain import capture_plan, assert_pushed_filters  # noqa: F401
from openmatch_spark.plans.pipeline import index_and_search  # noqa: F401
