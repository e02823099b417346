from combblas_spark.plans.superstep import SuperstepRunner  # noqa: F401
