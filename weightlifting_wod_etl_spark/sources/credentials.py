"""Credentials resolution — OP24 of the reference.

Reference: ``get_wordpress_credentials`` (``handler.py:23-85``) tries AWS
Secrets Manager first, falls back to environment variables, and returns
``(None, None)`` rather than raising when neither is available — the same
fail-open philosophy as the idempotency service (never block the pipeline
on auxiliary infrastructure).

Engine analog, priority order:
  1. explicit reader options (``username``/``password``) — deployment
     config wins, like any Spark source option;
  2. a JSON secrets file (``secrets_file`` option) — the local stand-in
     for a secret store; the store transport itself stays out of the
     engine exactly as the SNS transport does for OP22;
  3. environment variables ``WOD_API_USERNAME`` / ``WOD_API_PASSWORD``;
  4. ``(None, None)`` — anonymous, fail-open.

A corrupt or unreadable secrets file falls through to the next source
(fail-open), mirroring the reference's broad exception fallback at
``handler.py:60-74``.
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Mapping

log = logging.getLogger(__name__)


def resolve_credentials(
    options: Mapping[str, str],
    env: Mapping[str, str] | None = None,
) -> tuple[str | None, str | None]:
    env = os.environ if env is None else env

    user = options.get("username")
    pwd = options.get("password")
    if user and pwd:
        return user, pwd
    if bool(user) != bool(pwd):
        # half-configured explicit creds are almost always a deployment
        # mistake — surface it loudly before falling through (fail-open)
        log.warning(
            "explicit credentials are partial (username %s, password %s); "
            "falling through to secrets file / environment",
            "set" if user else "missing",
            "set" if pwd else "missing",
        )

    secrets_file = options.get("secrets_file")
    if secrets_file:
        try:
            with open(secrets_file, encoding="utf-8") as f:
                secret = json.load(f)
            s_user = secret.get("username")
            s_pwd = secret.get("password")
            if s_user and s_pwd:
                return s_user, s_pwd
        except (OSError, json.JSONDecodeError, AttributeError):
            pass  # fail-open: fall through to env (handler.py:60-74)

    e_user = env.get("WOD_API_USERNAME")
    e_pwd = env.get("WOD_API_PASSWORD")
    if e_user and e_pwd:
        return e_user, e_pwd

    return None, None


def basic_auth_header(
    user: str | None, pwd: str | None, url: str | None = None
) -> dict[str, str]:
    """Authorization header for the endpoint transport; empty when
    anonymous (fail-open). When the endpoint URL is known and is plain
    http, the Basic token would travel in cleartext — warn loudly (the
    transport may still be a TLS-terminating proxy, so we don't refuse)."""
    if not user or not pwd:
        return {}
    if url and url.lower().startswith("http://"):
        log.warning(
            "attaching Basic credentials to a non-https endpoint (%s): "
            "the token is sent in cleartext", url.split("?", 1)[0]
        )
    import base64

    token = base64.b64encode(f"{user}:{pwd}".encode()).decode("ascii")
    return {"Authorization": f"Basic {token}"}
