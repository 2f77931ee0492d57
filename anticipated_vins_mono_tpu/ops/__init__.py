"""Core math/geometry ops: Lie groups, cameras, preintegration, factors, solvers."""

from anticipated_vins_mono_tpu.ops import lie  # noqa: F401
