"""Engine exception hierarchy.

Mirrors the reference's taxonomy (src/common/exceptions.py:1-56) so a
user of the reference can catch the same error classes. In Spark most
failures surface as AnalysisException / Py4J errors at action time;
the Pipeline facade and the config factory translate them into this
hierarchy at the API boundary (the lazy-plan model means read errors
often only appear at execution, so ReadError/WriteError wrap the
failing *stage*, not the failing call site).
"""

from __future__ import annotations


class ETLError(Exception):
    """Base exception for all engine errors."""


class ConnectionError(ETLError):  # noqa: A001 — matches the reference name
    """Connection to source/destination failed."""


class SchemaError(ETLError):
    """Schema-related errors."""


class ReadError(ETLError):
    """Error reading from source."""


class WriteError(ETLError):
    """Error writing to destination."""


class TransformError(ETLError):
    """Error during transformation."""


class ConfigurationError(ETLError):
    """Invalid configuration."""


class StateError(ETLError):
    """State management error."""


class ValidationError(ETLError):
    """Data validation error."""


class PipelineError(ETLError):
    """Pipeline execution error."""


class StorageError(ETLError):
    """Storage operation error."""
