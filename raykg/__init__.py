"""raykg — Ray-Data-native book/corpus knowledge-graph engine.

Importing the package installs one narrowly-scoped logging filter (below);
nothing else happens at import time.
"""

import logging


class _SpuriousSchemaHashFilter(logging.Filter):
    """Drop Ray Data's "Failed to hash the schemas (for deduplication)"
    warning.

    ``pyarrow.Schema.__hash__`` raises ``TypeError: unhashable type: 'dict'``
    whenever the schema carries key-value metadata (e.g. the ``pandas``
    metadata block every pandas/pyarrow parquet writer embeds).  Ray 2.49's
    schema-unify fast path (``transform_pyarrow.py`` ``set(schemas)``) tries
    to hash schemas purely as an early-exit optimization, logs this warning
    on failure, and falls back to the correct full unify — so the message is
    spurious for any parquet input written by pandas.  Filtering exactly
    this message keeps real transform_pyarrow warnings visible.
    """

    def filter(self, record: logging.LogRecord) -> bool:  # pragma: no cover
        return "Failed to hash the schemas" not in record.getMessage()


logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SpuriousSchemaHashFilter())
