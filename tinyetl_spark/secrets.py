"""Credential injection from ``TINYETL_SECRET_*`` environment variables
(parity: reference src/secrets.rs:6-86)."""

from __future__ import annotations

import os
import sys
from urllib.parse import quote, urlparse, urlunparse


def check_and_warn_about_password_in_url(url: str, source_name: str) -> None:
    parsed = urlparse(url)
    has_pw = bool(parsed.password) or "password=" in url or "pwd=" in url or (
        "://" not in url and ":" in url and "@" in url
    )
    if has_pw:
        print(
            f"Warning: Using passwords in CLI parameters for {source_name} is "
            f"insecure. Consider using --source-secret-id / --dest-secret-id.",
            file=sys.stderr,
        )


def resolve_secret(secret_id: str) -> str:
    env_var = f"TINYETL_SECRET_{secret_id}"
    value = os.environ.get(env_var)
    if value is None:
        raise KeyError(f"Secret not found: Environment variable {env_var} is not set")
    return value


def process_connection_string(
    original_url: str, secret_id: str | None, connection_type: str
) -> str:
    """Inject the resolved secret as the URL password; the secret wins
    over any inline password (with a warning)."""
    check_and_warn_about_password_in_url(original_url, connection_type)
    if secret_id is None:
        return original_url
    secret = resolve_secret(secret_id)
    parsed = urlparse(original_url)
    if not parsed.scheme or not parsed.netloc:
        raise ValueError(
            f"Cannot inject secret into non-URL connection string for "
            f"{connection_type}. URL format required when using secret IDs."
        )
    if parsed.password:
        print(
            f"Overriding password in {connection_type} URL with secret from "
            f"environment variable",
            file=sys.stderr,
        )
    user = parsed.username or ""
    host = parsed.hostname or ""
    port = f":{parsed.port}" if parsed.port else ""
    netloc = f"{user}:{quote(secret, safe='')}@{host}{port}"
    return urlunparse(parsed._replace(netloc=netloc))
