"""robots.txt FILE parsing (RFC 9309) — the front half of the robots
pipeline: a crawl fetches ``/robots.txt`` per host, parses it into the
per-agent rule group, and only then can the path-rule gate
(``q_robots_rules_filter``'s broadcast rules table) exist. The r11
surface assumed the rules table; this module produces it from payload
text.

Deterministic subset of RFC 9309 (documented choices):

- lines split on ``\\n``; ``#`` comments stripped; ``key: value``
  directives, keys case-insensitive;
- a GROUP is one or more consecutive ``User-agent`` lines followed by
  its rules; blank lines do NOT terminate a group (RFC 9309 §2.1 —
  unlike the original 1994 REP); rules before any ``User-agent`` line
  are ignored;
- agent matching is case-insensitive: a token matches when it is ``*``
  or a prefix of the crawler's product token; the MOST SPECIFIC
  (longest) matching token wins, and every group carrying that token
  merges (RFC 9309 §2.2.1);
- path rule evaluation is longest-match-wins; on a tie Allow wins
  (§2.2.2); no rules -> allowed. ``$``/``*`` wildcards are NOT
  implemented (prefix rules only — same subset as the r11 path gate);
- ``Crawl-delay`` (non-RFC but ubiquitous) and ``Sitemap`` (global,
  group-independent) are surfaced.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RobotsPolicy:
    matched_agent: str  # the winning user-agent token ('' = no group)
    rules: tuple[tuple[int, str], ...]  # (allow 1/0, path prefix)
    crawl_delay: int  # seconds, -1 when absent
    sitemaps: tuple[str, ...]


def parse_robots_txt(text: str, agent: str) -> RobotsPolicy:
    """Parse one robots.txt payload and select the rule group for
    ``agent`` per RFC 9309 group-selection semantics."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[int, str]], int]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[int, str]] = []
    cur_delay = -1
    in_agent_run = False  # consecutive User-agent lines stack into one group

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], -1

    for raw in text.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue  # blank lines do NOT terminate a group (RFC 9309)
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)  # global directive, outside groups
            continue
        if key == "user-agent":
            if not in_agent_run:
                flush()
            if val:
                cur_agents.append(val.lower())
            in_agent_run = True
            continue
        in_agent_run = False
        if not cur_agents:
            continue  # rules before any User-agent line: ignored
        if key in ("allow", "disallow"):
            if val:
                cur_rules.append((1 if key == "allow" else 0, val))
            # an empty Disallow means "allow everything": no rule
        elif key == "crawl-delay":
            try:
                cur_delay = int(float(val))
            except ValueError:
                pass

    flush()

    # group selection: most specific matching token, '*' as fallback;
    # all groups carrying the winning token merge
    best = ""
    has_star = False
    for agents, _, _ in groups:
        for tok in agents:
            if tok == "*":
                has_star = True
            elif agent_l.startswith(tok) and len(tok) > len(best):
                best = tok
    if not best and has_star:
        best = "*"
    rules: list[tuple[int, str]] = []
    delay = -1
    if best:
        for agents, rs, dl in groups:
            if best in agents:
                rules.extend(rs)
                if dl >= 0:
                    delay = dl
    return RobotsPolicy(best, tuple(rules), delay, tuple(sitemaps))


def path_allowed(policy: RobotsPolicy, path: str) -> bool:
    """RFC 9309 §2.2.2 evaluation over prefix rules: longest matching
    rule wins; Allow wins ties; no matching rule -> allowed."""
    best_len = -1
    best_allow = True
    for allow, prefix in policy.rules:
        if path.startswith(prefix):
            ln = len(prefix)
            if ln > best_len or (ln == best_len and allow == 1):
                best_len = ln
                best_allow = allow == 1
    return best_allow
