"""SimpleAuthenticator parity (reference auth/SimpleAuthenticator.java):
passwd-file login in PLAIN and MD5 modes, identical error messages for
unknown-user vs wrong-password (and unknown vs unauthorized keyspace),
comma-exact access lists, Engine.login delegation."""

import hashlib

import pytest

from apache_cassandra_spark.auth import (
    AllowAllAuthenticator,
    AuthenticationException,
    AuthorizationException,
    SimpleAuthenticator,
    load_properties,
)

PASSWD = {"alice": "sekrit", "bob": "hunter2"}
ACCESS = {"Keyspace1": "alice,bob", "Private": "alice"}


def test_plain_login_success_and_authorization():
    a = SimpleAuthenticator(PASSWD, ACCESS)
    a.login("Keyspace1", {"username": "alice", "password": "sekrit"})
    a.login("Private", {"username": "alice", "password": "sekrit"})
    with pytest.raises(AuthorizationException) as e1:
        a.login("Private", {"username": "bob", "password": "hunter2"})
    with pytest.raises(AuthorizationException) as e2:
        a.login("NoSuchKeyspace", {"username": "bob", "password": "hunter2"})
    # unauthorized user and unknown keyspace: indistinguishable messages
    assert str(e1.value).replace("Private", "X") == str(e2.value).replace("NoSuchKeyspace", "X")


def test_unknown_user_and_wrong_password_same_message():
    a = SimpleAuthenticator(PASSWD, ACCESS)
    with pytest.raises(AuthenticationException) as e1:
        a.login("Keyspace1", {"username": "alice", "password": "wrong"})
    with pytest.raises(AuthenticationException) as e2:
        a.login("Keyspace1", {"username": "mallory", "password": "wrong"})
    assert str(e1.value).replace("alice", "U") == str(e2.value).replace("mallory", "U")


def test_missing_credential_keys():
    a = SimpleAuthenticator(PASSWD, ACCESS)
    with pytest.raises(AuthenticationException, match="username"):
        a.login("Keyspace1", {"password": "x"})
    with pytest.raises(AuthenticationException, match="password"):
        a.login("Keyspace1", {"username": "alice"})
    with pytest.raises(AuthenticationException):
        a.login("Keyspace1", None)


def test_md5_mode():
    a = SimpleAuthenticator(
        {"alice": hashlib.md5(b"sekrit").hexdigest()}, {"Keyspace1": "alice"}, mode="MD5"
    )
    a.login("Keyspace1", {"username": "alice", "password": "sekrit"})
    with pytest.raises(AuthenticationException):
        a.login("Keyspace1", {"username": "alice", "password": "not-it"})


def test_invalid_mode_message():
    with pytest.raises(AuthenticationException, match="not a valid mode"):
        SimpleAuthenticator(PASSWD, ACCESS, mode="SCRYPT")


def test_access_list_is_comma_exact():
    # reference parity: split(",") with NO trimming — "A, B" does not
    # authorize B (SimpleAuthenticator.java:137-140)
    a = SimpleAuthenticator(PASSWD, {"Keyspace1": "alice, bob"})
    a.login("Keyspace1", {"username": "alice", "password": "sekrit"})
    with pytest.raises(AuthorizationException):
        a.login("Keyspace1", {"username": "bob", "password": "hunter2"})


def test_no_access_file_skips_authorization():
    a = SimpleAuthenticator(PASSWD)
    a.login("AnyKeyspaceAtAll", {"username": "bob", "password": "hunter2"})


def test_properties_file_roundtrip(tmp_path):
    pf = tmp_path / "passwd.properties"
    pf.write_text("# users\nalice = sekrit\nbob: hunter2\n\n! comment\n")
    af = tmp_path / "access.properties"
    af.write_text("Keyspace1 = alice,bob\n")
    assert load_properties(str(pf)) == PASSWD
    a = SimpleAuthenticator(str(pf), str(af))
    a.login("Keyspace1", {"username": "bob", "password": "hunter2"})
    with pytest.raises(AuthenticationException):
        a.login("Keyspace1", {"username": "bob", "password": "nope"})


def test_allow_all_default():
    AllowAllAuthenticator().login("anything", None)


def test_engine_login_delegates(spark, tmp_path):
    from apache_cassandra_spark.catalog import Catalog
    from apache_cassandra_spark.engine import Engine

    cat = Catalog.from_dict({"Keyspace1": {"Standard1": {"compare_with": "UTF8Type"}}})
    eng = Engine(spark, str(tmp_path / "store"), cat)
    eng.login("Keyspace1", None)  # AllowAll default: no-op

    eng2 = Engine(
        spark,
        str(tmp_path / "store2"),
        cat,
        authenticator=SimpleAuthenticator(PASSWD, ACCESS),
    )
    eng2.login("Keyspace1", {"username": "alice", "password": "sekrit"})
    with pytest.raises(AuthenticationException):
        eng2.login("Keyspace1", {"username": "alice", "password": "bad"})
    with pytest.raises(AuthorizationException):
        eng2.login("Private", {"username": "bob", "password": "hunter2"})


def test_properties_first_separator_wins(tmp_path):
    """java.util.Properties splits at the FIRST separator char: a
    colon-separated line whose value contains '=' must not be misparsed."""
    from apache_cassandra_spark.auth import load_properties

    p = tmp_path / "passwd.properties"
    p.write_text("alice: p=ss\nbob=secret:x\n")
    props = load_properties(str(p))
    assert props == {"alice": "p=ss", "bob": "secret:x"}
