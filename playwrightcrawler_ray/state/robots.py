"""Minimal robots.txt rules: parse once per host, evaluate per path.

A deliberate capability ADD — the reference has no robots handling at
all (verified: zero matches in /root/reference; SURVEY.md §2.3 T7) but
the north rule requires it. Semantics follow the public REP spec
(RFC 9309): ``User-agent`` groups, ``Allow``/``Disallow`` prefix rules,
longest-prefix-match wins with Allow beating Disallow on ties; only the
``*`` agent group is honored (the engine sends one UA). ``$`` anchors
and ``*`` wildcards inside rules are supported.
"""

from __future__ import annotations

import re


class RobotsRules:
    def __init__(self, rules: list[tuple[bool, str]], crawl_delay: float | None = None):
        # rules: (allow, path_pattern) — original prefix strings
        self.rules = rules
        self.crawl_delay = crawl_delay
        self._compiled = [
            (allow, len(p), self._compile(p)) for allow, p in rules if p
        ]

    @staticmethod
    def _compile(prefix: str) -> re.Pattern:
        pat = re.escape(prefix).replace(r"\*", ".*")
        if pat.endswith(r"\$"):
            pat = pat[:-2] + "$"
        return re.compile("^" + pat)

    def allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for allow, plen, pat in self._compiled:
            if pat.match(path):
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len, best_allow = plen, allow
        return best_allow

    @classmethod
    def parse(cls, text: str | None) -> "RobotsRules":
        """Parse a robots.txt body; None/empty → allow-all."""
        if not text:
            return cls([])
        rules: list[tuple[bool, str]] = []
        crawl_delay = None
        current_agents: set[str] = set()
        collecting_agents = False  # consecutive User-agent lines form one group
        for raw_line in text.splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                if not collecting_agents:
                    current_agents = set()
                    collecting_agents = True
                current_agents.add(val.lower())
                continue
            collecting_agents = False
            if "*" not in current_agents:
                continue
            if key == "disallow" and val:
                rules.append((False, val))
            elif key == "allow" and val:
                rules.append((True, val))
            elif key == "crawl-delay":
                try:
                    crawl_delay = float(val)
                except ValueError:
                    pass
        return cls(rules, crawl_delay)

    def state(self) -> dict:
        return {"rules": self.rules, "crawl_delay": self.crawl_delay}

    @classmethod
    def from_state(cls, st: dict) -> "RobotsRules":
        return cls(list(st["rules"]), st["crawl_delay"])
