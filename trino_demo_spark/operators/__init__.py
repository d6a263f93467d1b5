from . import aggregates, relational, windows  # noqa: F401
