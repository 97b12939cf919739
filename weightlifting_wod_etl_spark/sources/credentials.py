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
import os
from collections.abc import Mapping


def resolve_credentials(
    options: Mapping[str, str],
    env: Mapping[str, str] | None = None,
) -> tuple[str | None, str | None]:
    env = os.environ if env is None else env

    user = options.get("username")
    pwd = options.get("password")
    if user and pwd:
        return user, pwd

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


def basic_auth_header(user: str | None, pwd: str | None) -> dict[str, str]:
    """Authorization header for the endpoint transport; empty when
    anonymous (fail-open)."""
    if not user or not pwd:
        return {}
    import base64

    token = base64.b64encode(f"{user}:{pwd}".encode()).decode("ascii")
    return {"Authorization": f"Basic {token}"}
