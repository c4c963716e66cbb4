from avr_tpu.render.common import RenderConsts, make_consts, compositing_weights  # noqa: F401
from avr_tpu.render.oracle import render_oracle  # noqa: F401
from avr_tpu.render.fused import render_fused  # noqa: F401
