from . import csv, document, jdbc, kafka  # noqa: F401
