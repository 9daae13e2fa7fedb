"""Archive URI rewriting — parity with ``otmt/archive_information.py:15-38``.

The reference rewrites memento URIs of known web archives into their raw
(``id_/``) form so content fetches bypass archive chrome. The engine keeps
the same semantics as a scalar string kernel: given a URI-M whose path
embeds ``/<timestamp>/<original-uri>``, insert the raw infix after the
timestamp for known archive hosts. Idempotent: an already-raw URI is
returned unchanged (the property the reference's tests assert —
tests/archive_information_test.py).
"""

from __future__ import annotations

import re

# host → raw infix (the reference's mapping table, archive_information.py:10-13)
ARCHIVE_RAW_INFIX: dict[str, str] = {
    "web.archive.org": "id_",
    "wayback.archive-it.org": "id_",
}

_TS_PATH = re.compile(r"^(https?://([^/]+)/[^/]*?/)(\d{14})(id_)?(/)")


def generate_raw_urim(urim: str) -> str:
    """Rewrite ``.../<14-digit-ts>/http...`` → ``.../<ts>id_/http...`` for
    known archive hosts; idempotent; unknown hosts pass through."""
    m = _TS_PATH.match(urim)
    if not m:
        return urim
    host = m.group(2).lower()
    infix = ARCHIVE_RAW_INFIX.get(host)
    if infix is None:
        return urim
    if m.group(4):  # already raw
        return urim
    return urim[: m.end(3)] + infix + urim[m.end(3):]
