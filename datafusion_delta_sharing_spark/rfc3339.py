"""One lenient RFC-3339 timestamp parse for the whole package.

The same normalization (uppercase/lowercase ``Z`` suffix -> explicit
``+00:00`` offset, one space separator -> ``T``) used to live hand-copied
in three modules — ``profile._parse_expiration``, ``plans.pruning._coerce``
and ``sources.schema.decode_partition_value`` — with a comment asking
future editors to keep them in sync (r5 review). A fix landing in one copy
and not the others would make timestamps parse in the profile but fail in
pruning (silently lost pruning) or vice versa, so the parse is shared and
only the TZ-AWARENESS POLICY stays at the call sites: the profile forces
UTC, pruning keeps naive values naive (aware-vs-naive comparisons raise
and the caller keeps the file), and partition decode keeps TimestampType
aware but strips the offset for NTZ wall-clock values.
"""

from __future__ import annotations

import datetime as _dt


def parse_rfc3339(raw: str) -> _dt.datetime:
    """Parse an RFC-3339 timestamp string; ``ValueError`` on garbage.

    Returns the datetime with whatever tz-awareness the input carried —
    callers apply their own normalization policy (see module docstring).
    """
    text = str(raw).strip().replace(" ", "T", 1)
    if text.endswith(("Z", "z")):
        text = text[:-1] + "+00:00"
    return _dt.datetime.fromisoformat(text)
