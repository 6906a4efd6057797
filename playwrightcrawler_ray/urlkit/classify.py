"""Link classification: the reference's ``@function_for_url`` dispatch
registry (playwrightcrawler.py:1998-2197) re-expressed as one pure
function suitable for a vectorized ``map_batches`` stage.

Three link classes, first-match-wins in registration order:

1. **relative** — scheme-less / loosely structured hrefs (reference
   ``relative_url`` patterns :2036-2042): resolved against the parent
   URL via ``urljoin``.
2. **full** — absolute ``http(s)://`` / ``ftp://`` (:2093).
3. **email** — ``mailto:`` plus ~20 observed misspellings (:2131-2134);
   the address is validated conservatively and recorded as a visited
   pseudo-document keyed ``parent_url|address``.

Anything matching no class is dropped (same as the reference, where
unmatched URLs simply never get a handler).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

_FLAGS = re.I | re.U

# Permissive relative-URL shapes (reference :2036-2042). Kept as data so
# the registry is extensible the way @function_for_url is.
RELATIVE_PATTERNS = [
    re.compile(r"^(\/|\.\.\/|\.\/)", _FLAGS),
    re.compile(
        r"^[0-9\-\./\?=_\&\s%@<>\(\);\+!,\w\$\'–’—”“a°§£Ã¬´c�í¦a]+$", _FLAGS
    ),
    re.compile(
        r"^[0-9\-\./\?=_\&\s%@<>\(\);\+!,\w\$\'–’—”“a°§£Ã¬´c]*[\?\/]"
        r"[0-9\-\./\?=_\&\s%@<>\(\);\+!,\w\$\'–’—”“a°§£Ã¬:\"¶c´™*]+$",
        _FLAGS,
    ),
]

FULL_PATTERNS = [re.compile(r"^https*://", _FLAGS), re.compile(r"^ftp://", _FLAGS)]

# mailto: and its misspellings (reference :2131-2134 / :2177-2181).
_MAILTO_PREFIX = (
    r"^(mailto:|maillto:|maito:|mail:|malito:|mailton:|\"mailto:|"
    r"emailto:|maltio:|mainto:|E\-mail:|mailtfo:|mailtp:|mailtop:|"
    r"mailo:|mail to:|Email para:|email :|email:|E-mail: |mail-to:|"
    r"maitlo:|mail.to:)"
)
EMAIL_PREFIX_RE = re.compile(_MAILTO_PREFIX + r"(.*)", _FLAGS)
EMAIL_VALID_RE = re.compile(
    r"^([A-Za-z0-9]+[._-])*[A-Za-z0-9]+@[A-Za-z0-9-]+(\.[A-Za-z]{2,})+$"
)


def extract_email(raw: str) -> str | None:
    """Extract and validate an email address from a mailto-ish string;
    None when the prefix doesn't match or the address fails validation."""
    m = EMAIL_PREFIX_RE.match(raw)
    if not m:
        return None
    address = m.group(2)
    if EMAIL_VALID_RE.match(address):
        return address
    return None


def classify_link(raw_url: str, parent_url: str) -> list[dict]:
    """Classify one discovered href. Returns 0..1 link records:
    ``{url, visited, source, parent_host, host, emails?}``.

    Registration order mirrors the reference module order: relative,
    full, email — first match wins (the dispatch loop at
    playwrightcrawler.py:5112-5127 iterates registration order).
    """
    parent_host = urlsplit(parent_url).hostname
    for pat in RELATIVE_PATTERNS:
        if pat.search(raw_url):
            out_url = urljoin(parent_url, raw_url)
            return [
                {
                    "url": out_url,
                    "visited": False,
                    "source": "relative_url",
                    "parent_host": parent_host,
                    "host": urlsplit(out_url).hostname,
                }
            ]
    for pat in FULL_PATTERNS:
        if pat.search(raw_url):
            return [
                {
                    "url": raw_url,
                    "visited": False,
                    "source": "full_url",
                    "parent_host": parent_host,
                    "host": urlsplit(raw_url).hostname,
                }
            ]
    if EMAIL_PREFIX_RE.match(raw_url):
        address = extract_email(raw_url)
        if address:
            return [
                {
                    "url": parent_url + "|" + address,
                    "emails": [address],
                    "visited": True,
                    "source": "email_url",
                    "parent_host": parent_host,
                    "host": parent_host,
                    "isopendir": False,
                }
            ]
        return []
    return []
