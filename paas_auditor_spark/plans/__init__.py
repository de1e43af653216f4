from paas_auditor_spark.plans.explain import (  # noqa: F401
    assert_plan_contains,
    assert_plan_lacks,
    physical_plan,
)
