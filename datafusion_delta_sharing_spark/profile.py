"""Delta Sharing connection profile.

Parity target: ``/root/reference/src/profile.rs`` — a profile is a small JSON
document with ``shareCredentialsVersion``, ``endpoint``, ``bearerToken`` and
optional ``expirationTime`` (src/profile.rs:30-35). The reference supports
only credentials version 1 with a bearer token (src/profile.rs:80-95);
expired tokens are rejected at authorization time (src/profile.rs:317-324,
342-356); the token is redacted from debug output.

BEYOND the reference: credentials version 2 with
``type: "oauth_client_credentials"`` (delta-sharing PROFILE.md) —
``OAuthClientCredentialsProfile`` fetches short-lived access tokens from
``tokenEndpoint`` via the OAuth2 client-credentials grant, caches them, and
refreshes ahead of expiry. ``Profile.from_json`` dispatches on the version,
so every consumer (client, reader, DataSource executors reconstructing from
``profile_json``) gets the right behavior transparently.
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
    from datafusion_delta_sharing_spark.rfc3339 import parse_rfc3339

    try:
        parsed = parse_rfc3339(raw)
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
        """Build a profile from a JSON string or already-parsed dict.
        Dispatches on ``shareCredentialsVersion``: 1 -> bearer token,
        2 + ``oauth_client_credentials`` -> OAuth profile."""
        if isinstance(doc, str):
            try:
                doc = json.loads(doc)
            except json.JSONDecodeError as exc:
                raise ProfileError(f"malformed profile JSON: {exc}") from exc
        if not isinstance(doc, dict):
            raise ProfileError("profile JSON must be an object")
        try:
            version = int(doc.get("shareCredentialsVersion",
                                  _SUPPORTED_VERSION))
        except (TypeError, ValueError) as exc:
            raise ProfileError(
                "profile shareCredentialsVersion must be an integer, got "
                f"{doc.get('shareCredentialsVersion')!r}") from exc
        if version == 2:
            return OAuthClientCredentialsProfile.from_doc(doc)
        if version != 1:
            # diagnose the VERSION first: a v3 profile without bearerToken
            # used to report 'missing required field: bearerToken', which
            # misleads the operator about the actual problem
            raise ProfileError(
                f"unsupported profile version {version} "
                "(shareCredentialsVersion; supported: 1 bearer token, "
                "2 OAuth client credentials)")
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
            share_credentials_version=version,
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

    def to_doc(self) -> dict:
        """Round-trippable profile document (``Profile.from_json`` input)
        — how the reader ships credentials to executor fetch tasks. A
        hand-built v1 doc there silently broke every non-bearer profile
        type (the OAuth path crashed on ``.bearer_token``)."""
        doc = {
            "shareCredentialsVersion": self.share_credentials_version,
            "endpoint": self.endpoint,
            "bearerToken": self.bearer_token,
        }
        if self.expiration_time is not None:
            doc["expirationTime"] = self.expiration_time.isoformat()
        return doc

    def __str__(self) -> str:  # never leak the token
        return (
            f"Profile(endpoint={self.endpoint!r}, bearer_token='<redacted>', "
            f"version={self.share_credentials_version})"
        )


class OAuthClientCredentialsProfile:
    """Credentials-version-2 profile: short-lived access tokens via the
    OAuth2 client-credentials grant (delta-sharing PROFILE.md; the
    reference supports only v1 bearer tokens). Duck-type compatible with
    :class:`Profile` — same ``endpoint`` / ``share_credentials_version``
    / ``authorization_header()`` surface — so the client, reader, and
    DataSource executors use it transparently.

    Tokens are cached per instance and refreshed ``_SKEW_S`` seconds
    before expiry; each executor reconstructing the profile from
    ``profile_json`` fetches its own token (no cross-process sharing
    needed — the grant is cheap and idempotent).
    """

    _SKEW_S = 60.0

    def __init__(self, endpoint: str, token_endpoint: str, client_id: str,
                 client_secret: str, scope: str | None = None):
        if not endpoint or not (endpoint.startswith("http://")
                                or endpoint.startswith("https://")):
            raise ProfileError(
                f"profile endpoint must be an http(s) URL, got {endpoint!r}")
        if not token_endpoint or not client_id or not client_secret:
            raise ProfileError(
                "oauth_client_credentials profile needs tokenEndpoint, "
                "clientId and clientSecret")
        self.endpoint = endpoint.rstrip("/")
        self.token_endpoint = token_endpoint
        self.client_id = client_id
        self._client_secret = client_secret
        self.scope = scope
        self.share_credentials_version = 2
        self._token: str | None = None
        self._token_expiry: float = 0.0

    @classmethod
    def from_doc(cls, doc: dict) -> "OAuthClientCredentialsProfile":
        kind = doc.get("type", "oauth_client_credentials")
        if kind != "oauth_client_credentials":
            raise ProfileError(
                f"unsupported shareCredentialsVersion 2 type {kind!r}; "
                "only oauth_client_credentials is supported")
        missing = [k for k in ("endpoint", "tokenEndpoint", "clientId",
                               "clientSecret") if not doc.get(k)]
        if missing:
            raise ProfileError(
                f"profile missing required field(s): {', '.join(missing)}")
        return cls(endpoint=str(doc["endpoint"]),
                   token_endpoint=str(doc["tokenEndpoint"]),
                   client_id=str(doc["clientId"]),
                   client_secret=str(doc["clientSecret"]),
                   scope=doc.get("scope"))

    def _fetch_token(self) -> None:
        import time

        import requests

        body = {"grant_type": "client_credentials",
                "client_id": self.client_id,
                "client_secret": self._client_secret}
        if self.scope:
            body["scope"] = self.scope
        resp = requests.post(self.token_endpoint, data=body, timeout=30.0)
        if resp.status_code >= 400:
            raise ProfileError(
                f"token endpoint returned HTTP {resp.status_code}: "
                f"{resp.text[:200]}")
        try:
            doc = resp.json()
            token = doc["access_token"]
            # expires_in: null (and non-dict bodies above) must map to
            # ProfileError too, not TypeError after the token was
            # already assigned
            raw_exp = doc.get("expires_in")
            expires_in = float(raw_exp) if raw_exp is not None else 3600.0
        except (ValueError, KeyError, TypeError) as exc:
            raise ProfileError(
                f"malformed token response: {exc}") from exc
        self._token = str(token)
        self._token_expiry = time.time() + expires_in - self._SKEW_S

    def authorization_header(self, now=None) -> dict[str, str]:
        import time

        if self._token is None or time.time() >= self._token_expiry:
            self._fetch_token()
        return {"Authorization": f"Bearer {self._token}"}

    def is_expired(self, now=None) -> bool:
        return False  # tokens self-refresh; the grant itself doesn't expire

    def to_doc(self) -> dict:
        """Round-trippable profile document (``Profile.from_json``
        dispatches back to this class) — ships the GRANT, not a token:
        each executor reconstructing the profile fetches its own
        short-lived token, per the class contract. Same trust domain as
        the v1 path, which ships the long-lived bearer token itself."""
        doc = {
            "shareCredentialsVersion": 2,
            "type": "oauth_client_credentials",
            "endpoint": self.endpoint,
            "tokenEndpoint": self.token_endpoint,
            "clientId": self.client_id,
            "clientSecret": self._client_secret,
        }
        if self.scope:
            doc["scope"] = self.scope
        return doc

    def __str__(self) -> str:  # never leak the secret or token
        return (f"OAuthClientCredentialsProfile(endpoint={self.endpoint!r}, "
                f"client_id={self.client_id!r}, secret='<redacted>')")

    __repr__ = __str__


class RotatingFileProfile:
    """A v1 bearer profile BOUND to its ``.share`` file, with opt-in
    on-expired reload (VERDICT r8 #7 — the rotation pattern ops teams
    run: a credential manager atomically replaces the profile file with
    a fresh token ahead of / at expiry).

    The reference stops at reject-at-authorize
    (src/profile.rs:317-356), and that stays the DEFAULT everywhere
    (``Profile.from_path``, connection strings, the DataSource). This
    wrapper is the documented recovery path behind it: when the
    in-memory token's ``expirationTime`` has passed, the next authorize
    re-reads the file ONCE; if the rotated token is valid the session
    continues, otherwise the standard expired ``ProfileError`` raises.
    A rotation that changes the ENDPOINT is refused — silently
    re-pointing a live session at a different server is a misconfig,
    not a refresh.

    Duck-type compatible with :class:`Profile` (``endpoint`` /
    ``share_credentials_version`` / ``authorization_header()`` /
    ``is_expired()`` / ``to_doc()``). ``to_doc`` ships the CURRENT
    snapshot — executors reconstructing from ``profile_json`` do not
    reload (they may not share the driver's filesystem); a snapshot
    expiring mid-task fails that task, and the retried task gets the
    rotated snapshot from the driver.
    """

    def __init__(self, path: str | os.PathLike):
        self._path = os.fspath(path)
        self._current = self._read()

    def _read(self) -> Profile:
        loaded = Profile.from_path(self._path)
        if not isinstance(loaded, Profile):
            raise ProfileError(
                "on_expired='reload' applies to bearer (v1) profiles; "
                "OAuth client-credentials profiles already self-refresh")
        return loaded

    @property
    def endpoint(self) -> str:
        return self._current.endpoint

    @property
    def share_credentials_version(self) -> int:
        return self._current.share_credentials_version

    @property
    def expiration_time(self):
        return self._current.expiration_time

    def is_expired(self, now: datetime | None = None) -> bool:
        """Consults the same one-shot re-read as authorization_header
        (r9 review): a caller that fail-fast-gates on is_expired() must
        see the rotated credential too, or the recovery never engages
        for that pattern. An unreadable or endpoint-changing rotation
        just reports expired here — the loud error stays with
        authorization_header, where the request is actually refused."""
        if self._current.is_expired(now):
            try:
                rotated = self._read()
            except ProfileError:
                return True
            if (rotated.endpoint == self._current.endpoint
                    and not rotated.is_expired(now)):
                self._current = rotated
        return self._current.is_expired(now)

    def authorization_header(self, now: datetime | None = None
                             ) -> dict[str, str]:
        if self._current.is_expired(now):
            rotated = self._read()
            if rotated.endpoint != self._current.endpoint:
                raise ProfileError(
                    "rotated profile changed the endpoint "
                    f"({self._current.endpoint!r} -> {rotated.endpoint!r});"
                    " refusing to re-point a live session")
            self._current = rotated
        # still-expired (no rotation happened): the standard rejection
        return self._current.authorization_header(now)

    def to_doc(self) -> dict:
        return self._current.to_doc()

    def __str__(self) -> str:  # never leak the token
        return (f"RotatingFileProfile(path={self._path!r}, "
                f"current={self._current})")

    __repr__ = __str__


def load_profile(path: str | os.PathLike, on_expired: str = "reject"):
    """Load a ``.share`` profile file. ``on_expired='reject'`` (default,
    reference behavior): expired tokens raise at every authorize.
    ``on_expired='reload'``: wrap in :class:`RotatingFileProfile` so an
    expired token triggers one re-read of the (rotated) file before
    rejecting."""
    if on_expired == "reject":
        return Profile.from_path(path)
    if on_expired == "reload":
        return RotatingFileProfile(path)
    raise ProfileError(
        f"on_expired must be 'reject' or 'reload', got {on_expired!r}")
