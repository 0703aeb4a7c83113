from distributionraytracer_tpu.integrator.whitted import trace_whitted  # noqa: F401
from distributionraytracer_tpu.integrator.render import render_image  # noqa: F401
