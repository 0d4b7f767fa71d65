"""Gaussian model state, MCMC densification, and optimization."""

from gsplat_tpu.model.gaussians import GaussianState  # noqa: F401
