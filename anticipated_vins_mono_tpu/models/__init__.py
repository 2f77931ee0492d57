"""Estimator, feature selector, horizon generator, front end, pose graph."""
