"""Pure math: spherical harmonics, quaternions, covariances, camera models."""
