"""Profile + securable tests, mirroring the reference's failure-mode coverage
(src/profile.rs:358-496, src/securable.rs:275-314)."""

import json
from datetime import datetime, timedelta, timezone

import pytest

from datafusion_delta_sharing_spark.errors import ProfileError, SecurableError
from datafusion_delta_sharing_spark.profile import Profile
from datafusion_delta_sharing_spark.securable import (
    Schema,
    Share,
    Table,
    parse_securable,
)

VALID = {
    "shareCredentialsVersion": 1,
    "endpoint": "https://sharing.example.com/delta-sharing",
    "bearerToken": "abc123",
}


def test_profile_parses_valid_json():
    p = Profile.from_json(json.dumps(VALID))
    assert p.endpoint == "https://sharing.example.com/delta-sharing"
    assert p.bearer_token == "abc123"
    assert not p.is_expired()
    assert p.authorization_header() == {"Authorization": "Bearer abc123"}


def test_profile_from_path(tmp_path):
    path = tmp_path / "p.share"
    path.write_text(json.dumps({**VALID, "expirationTime": "2099-01-01T00:00:00Z"}))
    p = Profile.from_path(path)
    assert p.expiration_time.year == 2099


def test_profile_missing_file():
    with pytest.raises(ProfileError, match="cannot read"):
        Profile.from_path("/nonexistent/profile.share")


def test_profile_malformed_json():
    with pytest.raises(ProfileError, match="malformed"):
        Profile.from_json("{not json")


def test_profile_missing_fields():
    with pytest.raises(ProfileError, match="bearerToken"):
        Profile.from_json({"shareCredentialsVersion": 1, "endpoint": "https://x"})


def test_profile_bad_version():
    with pytest.raises(ProfileError, match="version"):
        Profile.from_json({**VALID, "shareCredentialsVersion": 3})
    # version 2 dispatches to OAuth and demands its fields (a bearer-only
    # doc marked v2 is a config error, reported as the missing fields)
    with pytest.raises(ProfileError, match="tokenEndpoint"):
        Profile.from_json({**VALID, "shareCredentialsVersion": 2})


def test_profile_bad_endpoint():
    with pytest.raises(ProfileError, match="http"):
        Profile.from_json({**VALID, "endpoint": "ftp://nope"})


def test_profile_expired_token_rejected_at_authorize():
    past = (datetime.now(timezone.utc) - timedelta(hours=1)).isoformat()
    p = Profile.from_json({**VALID, "expirationTime": past})
    assert p.is_expired()
    with pytest.raises(ProfileError, match="expired"):
        p.authorization_header()


def test_profile_token_redacted_in_repr_and_str():
    p = Profile.from_json(VALID)
    for rendered in (repr(p), str(p)):
        assert "abc123" not in rendered


# -- securables ----------------------------------------------------------


def test_share_schema_table_parse():
    assert Share.from_str("s1") == Share(name="s1")
    assert Schema.from_str("s1.sc") == Schema(share="s1", name="sc")
    t = Table.from_str("s1.sc.t")
    assert (t.share, t.schema, t.name) == ("s1", "sc", "t")
    assert t.full_name() == "s1.sc.t"
    assert t.view_name() == "s1__sc__t"


def test_parse_securable_dispatch():
    assert isinstance(parse_securable("a"), Share)
    assert isinstance(parse_securable("a.b"), Schema)
    assert isinstance(parse_securable("a.b.c"), Table)
    with pytest.raises(SecurableError):
        parse_securable("a.b.c.d")


@pytest.mark.parametrize("bad", ["", ".", "a.", ".b", "a..c", "a.b."])
def test_malformed_securables_rejected(bad):
    with pytest.raises(SecurableError):
        parse_securable(bad)


def test_oauth_profile_end_to_end():
    """shareCredentialsVersion 2: token fetched from the token endpoint,
    cached across calls, refreshed after expiry, secrets redacted."""
    import json as _json

    from datafusion_delta_sharing_spark.client import DeltaSharingClient
    from datafusion_delta_sharing_spark.errors import ProfileError
    from datafusion_delta_sharing_spark.profile import (
        OAuthClientCredentialsProfile,
        Profile,
    )
    from tests.mock_server import MockSharingServer, MockTable

    schema = _json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": False, "metadata": {}}]})
    srv = MockSharingServer(
        [MockTable(share="s", schema="d", name="t", schema_string=schema)])
    with srv:
        srv.oauth = {"client_id": "cid", "client_secret": "sekrit123",
                     "expires_in": 3600}
        doc = {"shareCredentialsVersion": 2,
               "type": "oauth_client_credentials",
               "endpoint": srv.endpoint,
               "tokenEndpoint": f"{srv.base_url}/oauth/token",
               "clientId": "cid", "clientSecret": "sekrit123"}
        profile = Profile.from_json(_json.dumps(doc))
        assert isinstance(profile, OAuthClientCredentialsProfile)
        assert "sekrit123" not in str(profile) + repr(profile)
        client = DeltaSharingClient(profile)
        assert [s.name for s in client.list_shares()] == ["s"]
        client.list_shares()
        assert len(srv.issued_tokens) == 1      # cached, not re-fetched
        profile._token_expiry = 0.0             # force refresh
        client.list_shares()
        assert len(srv.issued_tokens) == 2
        # wrong secret -> clear error from the token endpoint
        bad = Profile.from_json(_json.dumps({**doc, "clientSecret": "no"}))
        with pytest.raises(ProfileError, match="401"):
            DeltaSharingClient(bad).list_shares()
        # missing fields -> validation error
        with pytest.raises(ProfileError, match="tokenEndpoint"):
            Profile.from_json(_json.dumps(
                {"shareCredentialsVersion": 2, "endpoint": srv.endpoint,
                 "type": "oauth_client_credentials", "clientId": "x",
                 "clientSecret": "y"}))
