from . import data_stream  # noqa: F401  (registers the "data_stream" base + types)
