"""Detection models live in :mod:`papc_tpu.detect` (PointPillars).

PointRCNN: placeholder matching the reference's own empty
``models/detect/PointRCNN`` stub (README + empty ``__init__`` only —
the reference never implemented it either).
"""
