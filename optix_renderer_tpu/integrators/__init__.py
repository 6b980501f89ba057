"""Integrators: g-buffer visualizations, LTC analytic direct, ratio estimator, MIS path tracer."""
