"""Structured Streaming layer (E14) — populated in a later round; the
batch event-time window operators in operators/windows.py are written so
the identical expressions run under readStream + watermark."""
