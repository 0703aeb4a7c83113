from distributionraytracer_tpu.oracle.oracle import oracle_render, oracle_trace  # noqa: F401
