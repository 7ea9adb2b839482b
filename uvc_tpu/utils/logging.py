"""Leveled stderr logger (logging.{hpp,cpp} equivalent).

Ten levels logCRITICAL..logDEBUG4, timestamped, flushed per message, with
a runtime level gate. Region progress is throttled to power-of-two
ordinals like the reference (main.cpp:477)."""

import sys
import time

CRITICAL, ERROR, WARNING, INFO = 0, 1, 2, 3
DEBUG, DEBUG1, DEBUG2, DEBUG3, DEBUG4 = 4, 5, 6, 7, 8

_NAMES = ["CRITICAL", "ERROR", "WARNING", "INFO", "DEBUG", "DEBUG1",
          "DEBUG2", "DEBUG3", "DEBUG4"]

LEVEL = INFO


def set_level(level: int):
    global LEVEL
    LEVEL = level


def log(level: int, *parts):
    if level > LEVEL:
        return
    ts = time.strftime("%H:%M:%S")
    print(f"{ts} {_NAMES[level]}: " + " ".join(str(p) for p in parts),
          file=sys.stderr, flush=True)


def is_power_of_two(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def should_log_region(ordinal: int, total: int, always: bool = False) -> bool:
    """Throttle per-region INFO logs to powers of two (main.cpp:477)."""
    return always or is_power_of_two(ordinal + 1) or is_power_of_two(
        max(total - ordinal, 1))
