"""Episode event log: trace, replay, offline debugging.

Reference counterpart: the `event.proto` / `event_log.py` subsystem of
rebcabin/cartpoleplusplus (SURVEY.md §2a, §3.5). See format.md for the
redesigned column-major binary format and writer.py for the native-C++ /
pure-Python writer pair.

CLI: `python -m cartpoleplusplus_tpu.eventlog dump <file.cpe>`.
"""

from .writer import (
    EpisodeSink,
    EventLogWriter,
    next_episode_ids,
    read_records,
    validate,
)

__all__ = ["EpisodeSink", "EventLogWriter", "next_episode_ids",
           "read_records", "validate"]
