from frolyk_spark.plans.inspect import assert_scale_shape, plan_report

__all__ = ["plan_report", "assert_scale_shape"]
