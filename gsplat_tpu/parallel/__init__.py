"""Multi-device parallelism over a jax.sharding.Mesh.

A new capability tier the single-GPU reference lacks entirely (SURVEY.md
§2c): data parallelism over cameras (each device renders/differentiates its
own view, gradients all-reduced over ICI), and Gaussian-sharded rendering
(the tensor-parallel analogue: the P dimension sharded across devices with
an ordered compositing reduce).
"""

from gsplat_tpu.parallel.mesh import make_mesh  # noqa: F401
