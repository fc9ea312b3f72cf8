"""Error hierarchy for the Delta Sharing connector.

Mirrors the reference's error taxonomy (``/root/reference/src/error.rs:1-132``):
client-side errors (bad profile, bad request, parse failures) vs server-side
errors (5xx), with the server's ``{errorCode, message}`` body surfaced
(``/root/reference/src/client/response.rs:12-35``).
"""

from __future__ import annotations


class DeltaSharingError(Exception):
    """Base class for all connector errors."""


class ProfileError(DeltaSharingError):
    """Invalid, unreadable, or expired sharing profile (src/profile.rs:80-96)."""


class SecurableError(DeltaSharingError):
    """Malformed share/schema/table name (src/securable.rs:65-71)."""


class PredicateError(DeltaSharingError):
    """Predicate not expressible as a jsonPredicateHints tree (src/datasource/expr.rs:92-154)."""


class SchemaError(DeltaSharingError):
    """Delta schemaString that cannot be represented in Spark (src/datasource/schema.rs:497-508)."""


class HttpError(DeltaSharingError):
    """Transport or protocol failure talking to the sharing server."""

    def __init__(self, message: str, status: int | None = None,
                 error_code: str | None = None):
        super().__init__(message)
        self.status = status
        self.error_code = error_code


class ClientHttpError(HttpError):
    """HTTP 4xx — the request was wrong (src/error.rs:73-82)."""


class ServerHttpError(HttpError):
    """HTTP 5xx — the sharing server failed (src/error.rs:83-89)."""
