"""PointRCNN placeholder — the reference ships only an empty stub here
(``PAPC/models/detect/PointRCNN``: empty README + ``__init__``)."""
