"""Math/compute substrate: losses, retrieval metrics, CCA, audio DSP, kernels."""
