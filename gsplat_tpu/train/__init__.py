"""Training loops: static 3DGS-MCMC and sliding-window (SwinGS)."""
