"""Optical music recognition: segmentation U-Nets + geometric detectors."""
