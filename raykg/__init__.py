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


def _pin_fsspec_http_stub() -> None:
    """Make ``fsspec.implementations.http`` importable deterministically.

    When aiohttp is absent, that module RAISES on import.  Ray Data probes
    it on every read/write (``path_util._is_http_filesystem``) and catches
    the failure — but failed imports are never cached, so CONCURRENT Ray
    Data executions (driver threads, e.g. the units stage's parallel
    partitions) re-run the failing module body in parallel and CPython's
    import machinery surfaces a raw ``ImportError: cannot import name
    'HTTPFileSystem'`` in one of the threads.  Caching a minimal stub in
    ``sys.modules`` (only when the real import fails, i.e. only in
    network-less environments) makes the probe thread-safe; the class is
    used solely in ``isinstance`` checks, never instantiated.
    """
    import sys
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import types

        class HTTPFileSystem:  # pragma: no cover - isinstance target only
            def __init__(self, *a, **k):
                raise ModuleNotFoundError("aiohttp is not installed")

        mod = types.ModuleType("fsspec.implementations.http")
        mod.HTTPFileSystem = HTTPFileSystem
        mod.__doc__ = ("raykg stub (installed because the real module "
                       "failed to import: aiohttp is not installed).  Only "
                       "HTTPFileSystem is provided, as an isinstance "
                       "target; any other attribute raises.")

        def _missing(name: str):
            # any name besides HTTPFileSystem (e.g. HTTPStreamFile) gets a
            # truthful error instead of a confusing bare ImportError.
            # AttributeError, not ModuleNotFoundError (PEP 562): hasattr()
            # and getattr(mod, name, default) feature-probes must fall
            # through gracefully; from-imports still surface this as
            # ImportError with the message attached.
            raise AttributeError(
                "fsspec.implementations.http is a raykg stub (aiohttp is "
                f"not installed); attribute {name!r} is unavailable")

        mod.__getattr__ = _missing
        sys.modules["fsspec.implementations.http"] = mod


_pin_fsspec_http_stub()
