"""Authenticator parity: the reference's pluggable login check.

Mirrors ``auth/IAuthenticator.java`` + ``auth/AllowAllAuthenticator.java``
+ ``auth/SimpleAuthenticator.java`` (password properties file with PLAIN
or MD5 modes, then per-keyspace access list). Driver-side only — auth
gates the *session*, never the data plane, so nothing here touches a
DataFrame. Behavior parity notes:

* unknown user and wrong password raise the SAME message
  (``SimpleAuthenticator.java:93`` keeps them identical so attackers
  can't probe valid usernames); same for unknown vs unauthorized
  keyspace (``:136``);
* credentials must carry ``username`` and ``password`` keys
  (``:77-81``);
* MD5 mode compares the digest constant-time
  (``MessageDigest.isEqual``, ``:100``) — ``hmac.compare_digest`` here;
* the access file maps keyspace -> comma-separated usernames
  (``:131-139``).
"""

from __future__ import annotations

import hashlib
import hmac

USERNAME_KEY = "username"
PASSWORD_KEY = "password"
PASSWORD_MODES = ("PLAIN", "MD5")


class AuthenticationException(Exception):
    """thrift AuthenticationException analog (bad credentials)."""


class AuthorizationException(Exception):
    """thrift AuthorizationException analog (no access to keyspace)."""


def load_properties(path: str) -> dict[str, str]:
    """Minimal java.util.Properties reader: ``key = value`` / ``key: value``
    lines, ``#``/``!`` comments, surrounding whitespace stripped — the
    subset the reference's passwd/access files use.

    DOCUMENTED SUBSET (deliberate): full java.util.Properties also
    treats an unescaped whitespace run as a separator (``alice p ss``
    → key ``alice``), keeps separator-less lines as ``{line: ''}``,
    and supports backslash escapes / line continuations. None of those
    appear in the reference's ``passwd.properties`` / ``access
    .properties`` fixtures (conf/ in the reference tree), so this
    reader intentionally requires an explicit ``=``/``:`` separator and
    drops separator-less lines."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line[0] in "#!":
                continue
            # java.util.Properties splits at the FIRST separator char in
            # the line, whichever it is — trying '=' before ':' would
            # misparse 'alice: p=ss' as key 'alice: p'
            cut = min((i for i in (line.find("="), line.find(":")) if i >= 0), default=-1)
            if cut >= 0:
                props[line[:cut].strip()] = line[cut + 1 :].strip()
    return props


class AllowAllAuthenticator:
    """``auth/AllowAllAuthenticator.java``: every login succeeds."""

    def login(self, keyspace: str, credentials: dict | None = None) -> None:
        return None


class SimpleAuthenticator:
    """``auth/SimpleAuthenticator.java``: passwd check then keyspace ACL.

    ``passwd`` maps username -> password (PLAIN) or -> hex md5 of the
    password (MD5 mode); ``access`` maps keyspace -> comma-separated
    usernames (``None`` skips authorization, like an unset
    access.properties deployment that only wants authentication).
    Either may be given as a dict or a properties-file path."""

    def __init__(
        self,
        passwd: dict[str, str] | str,
        access: dict[str, str] | str | None = None,
        mode: str = "PLAIN",
    ) -> None:
        if mode not in PASSWORD_MODES:
            raise AuthenticationException(
                f"The requested password check mode '{mode}' is not a valid mode. "
                f"Possible values are {', '.join(repr(m) for m in PASSWORD_MODES)}, "
                "or leave it unspecified."
            )
        self.mode = mode
        self.passwd = load_properties(passwd) if isinstance(passwd, str) else dict(passwd)
        self.access = load_properties(access) if isinstance(access, str) else (
            dict(access) if access is not None else None
        )

    def _auth_error(self, username: str) -> AuthenticationException:
        # one message for unknown user AND wrong password (parity with
        # SimpleAuthenticator.authenticationErrorMessage)
        return AuthenticationException(
            f"Given password in password mode {self.mode} could not be "
            f"validated for user {username}"
        )

    def login(self, keyspace: str, credentials: dict | None = None) -> None:
        credentials = credentials or {}
        username = credentials.get(USERNAME_KEY)
        if username is None:
            raise AuthenticationException(
                f"Authentication request was missing the required key '{USERNAME_KEY}'"
            )
        password = credentials.get(PASSWORD_KEY)
        if password is None:
            raise AuthenticationException(
                f"Authentication request was missing the required key '{PASSWORD_KEY}'"
            )

        stored = self.passwd.get(username)
        if stored is None:
            raise self._auth_error(username)
        if self.mode == "PLAIN":
            ok = hmac.compare_digest(password.encode(), stored.encode())
        else:  # MD5
            digest = hashlib.md5(password.encode()).hexdigest()
            ok = hmac.compare_digest(digest.lower(), stored.strip().lower())
        if not ok:
            raise self._auth_error(username)

        if self.access is None:
            return
        allowed = self.access.get(keyspace)
        # exact comma-split, NO trimming — parity with the reference's
        # `allow.equals(username)` over `split(",")` (:137-140), whose
        # own comment claims space separation but whose code requires
        # "X = A,B,C" with no spaces
        authorized = allowed is not None and username in allowed.split(",")
        if not authorized:
            # one message for unknown keyspace AND unauthorized user
            raise AuthorizationException(
                f"User {username} could not be authorized to use keyspace {keyspace}"
            )
