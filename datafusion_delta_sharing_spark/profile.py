"""Delta Sharing connection profile.

Parity target: ``/root/reference/src/profile.rs`` — a profile is a small JSON
document with ``shareCredentialsVersion``, ``endpoint``, ``bearerToken`` and
optional ``expirationTime`` (src/profile.rs:30-35). Only credentials version 1
with a bearer token is supported (src/profile.rs:80-95); expired tokens are
rejected at authorization time (src/profile.rs:317-324, 342-356); the token is
redacted from debug output (src/profile.rs tests, token redaction).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone

from datafusion_delta_sharing_spark.errors import ProfileError

_SUPPORTED_VERSION = 1


def _parse_expiration(raw: str) -> datetime:
    """Parse an RFC-3339 expiration timestamp into an aware UTC datetime."""
    text = raw.strip()
    if text.endswith("Z"):
        text = text[:-1] + "+00:00"
    try:
        parsed = datetime.fromisoformat(text)
    except ValueError as exc:
        raise ProfileError(f"invalid expirationTime {raw!r}: {exc}") from exc
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=timezone.utc)
    return parsed.astimezone(timezone.utc)


@dataclass(frozen=True)
class Profile:
    """A validated Delta Sharing profile (credentials version 1, bearer token)."""

    endpoint: str
    bearer_token: str = field(repr=False)
    share_credentials_version: int = _SUPPORTED_VERSION
    expiration_time: datetime | None = None

    def __post_init__(self) -> None:
        if self.share_credentials_version != _SUPPORTED_VERSION:
            raise ProfileError(
                "unsupported shareCredentialsVersion "
                f"{self.share_credentials_version}; only version {_SUPPORTED_VERSION} "
                "(bearer token) is supported"
            )
        if not self.endpoint:
            raise ProfileError("profile endpoint must be non-empty")
        if not (self.endpoint.startswith("http://") or self.endpoint.startswith("https://")):
            raise ProfileError(f"profile endpoint must be an http(s) URL, got {self.endpoint!r}")
        if not self.bearer_token:
            raise ProfileError("profile bearerToken must be non-empty")

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_json(cls, doc: str | dict) -> "Profile":
        """Build a profile from a JSON string or already-parsed dict."""
        if isinstance(doc, str):
            try:
                doc = json.loads(doc)
            except json.JSONDecodeError as exc:
                raise ProfileError(f"malformed profile JSON: {exc}") from exc
        if not isinstance(doc, dict):
            raise ProfileError("profile JSON must be an object")
        missing = [k for k in ("shareCredentialsVersion", "endpoint", "bearerToken")
                   if k not in doc]
        if missing:
            raise ProfileError(f"profile missing required field(s): {', '.join(missing)}")
        expiration = None
        if doc.get("expirationTime"):
            expiration = _parse_expiration(str(doc["expirationTime"]))
        return cls(
            endpoint=str(doc["endpoint"]).rstrip("/"),
            bearer_token=str(doc["bearerToken"]),
            share_credentials_version=int(doc["shareCredentialsVersion"]),
            expiration_time=expiration,
        )

    @classmethod
    def from_path(cls, path: str | os.PathLike) -> "Profile":
        """Read a ``*.share`` profile file from disk."""
        try:
            with open(path, "r", encoding="utf-8") as handle:
                raw = handle.read()
        except OSError as exc:
            raise ProfileError(f"cannot read profile file {path!s}: {exc}") from exc
        return cls.from_json(raw)

    # -- behavior ---------------------------------------------------------

    def is_expired(self, now: datetime | None = None) -> bool:
        if self.expiration_time is None:
            return False
        now = now or datetime.now(timezone.utc)
        return now >= self.expiration_time

    def authorization_header(self, now: datetime | None = None) -> dict[str, str]:
        """``Authorization: Bearer …`` header; raises on an expired token
        (reference rejects expired tokens at authorize time, src/profile.rs:342-356).
        """
        if self.is_expired(now):
            raise ProfileError(
                f"bearer token expired at {self.expiration_time.isoformat()}"
            )
        return {"Authorization": f"Bearer {self.bearer_token}"}

    def __str__(self) -> str:  # never leak the token
        return (
            f"Profile(endpoint={self.endpoint!r}, bearer_token='<redacted>', "
            f"version={self.share_credentials_version})"
        )
