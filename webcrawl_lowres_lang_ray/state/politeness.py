"""Per-host politeness in deterministic virtual time.

The reference's politeness is a wall-clock sleep of
``sleep_delay + U(0, sleep_delay)`` seconds per query per worker
(lrl-crawler.py:332-335, config.json:24) — per *worker*, not per host
(SURVEY.md §2.3 A8 notes the quirk).  Wall-clock sleeps are untestable and
non-deterministic, so the rebuild expresses the same budget in virtual time:

* one **wave** == one politeness slot (>= sleep_delay seconds of virtual
  time);
* each host's token bucket holds ``per_host_per_wave`` tokens, refilled
  every wave;
* admission within a wave is in ``seq`` order (the reference's id order).

``HostBudget`` is the pure bucket logic; the distributed admission step in
frontier.py implements exactly this semantics as a groupby-per-host
head-k — the two are asserted equivalent in tests/test_state.py.
"""

from __future__ import annotations


class HostBudget:
    """Virtual-time token buckets, one per host, refilled per wave."""

    def __init__(self, tokens_per_wave: int):
        self.tokens_per_wave = tokens_per_wave
        self.used: dict[str, int] = {}

    def new_wave(self) -> None:
        self.used.clear()

    def try_admit(self, host: str) -> bool:
        u = self.used.get(host, 0)
        if u < self.tokens_per_wave:
            self.used[host] = u + 1
            return True
        return False

    def admit_order(self, rows: list[tuple[int, str]]) -> list[bool]:
        """rows = [(seq, host)]; must be pre-sorted by seq. Returns admit mask."""
        return [self.try_admit(host) for _seq, host in rows]
