"""Config env-var interpolation — ``${FOO}`` / ``${FOO:default}``.

Reference: internal/config/env_vars.go:11,31-40. Applied to the raw
config text before YAML parsing; Bloblang interpolations (``${! … }``)
are left untouched (the name pattern excludes ``!``). ``$${`` escapes
a literal ``${``.
"""

from __future__ import annotations

import re

_ENV_RE = re.compile(r"\$\{([A-Za-z0-9_.]+)(?::([^}]*))?\}")


def interpolate_env(text: str, env) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        default = m.group(2) if m.group(2) is not None else ""
        v = env.get(name)
        return v if v not in (None, "") else default

    out = []
    i = 0
    while i < len(text):
        if text.startswith("$${", i):
            out.append("${")
            i += 3
            continue
        m = _ENV_RE.match(text, i)
        if m:
            out.append(sub(m))
            i = m.end()
        else:
            out.append(text[i])
            i += 1
    return "".join(out)
