"""JVM log-cleanliness tripwire (round-10 verdict item 2).

Spark logs "Constructing trivially true equals predicate, 'x == x'.
Perhaps you need to use aliases." when both sides of a join condition
descend from the same Dataset and the column names collide. Spark 4's
dataset-id disambiguation usually still resolves the join correctly —
which is exactly why the warning is dangerous: the key stays green while
carrying the pattern that silently degenerates to a cross join under
refactors (it did in v_rerank_mmr until round 11 aliased the self-join).

The warning is emitted JVM-side through log4j2, invisible to Python-level
assertions, so this module attaches a programmatic log4j2 FileAppender to
the driver JVM's root logger (WARN+) and lets callers scan the captured
text incrementally. tools/check.py attaches it for every sweep, making a
dirty plan-builder log a per-key FAIL for all registered keys.
"""

from __future__ import annotations

import os
import tempfile

# Message fragments that fail a key. Deliberately narrow: generic WARNs
# (AQE advisories, large task binaries) are normal at sweep scale.
DIRTY_PATTERNS = (
    "Constructing trivially true equals predicate",
)


class WarningCapture:
    """Tail a log4j2 FileAppender attached to the driver JVM root logger."""

    def __init__(self, spark, path: str | None = None):
        if path is None:
            # mkstemp, not the race-prone deprecated mktemp: create the
            # file ourselves and hand log4j2 the claimed path (FileAppender
            # opens in append mode, so the pre-created empty file is fine).
            fd, path = tempfile.mkstemp(prefix="spark_warn_", suffix=".log")
            os.close(fd)
        self._path = path
        self._offset = 0
        self._appender = None
        jvm = spark._jvm
        try:
            ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(
                False
            )
            cfg = ctx.getConfiguration()
            layout = (
                jvm.org.apache.logging.log4j.core.layout.PatternLayout
                .createDefaultLayout(cfg)
            )
            builder = (
                jvm.org.apache.logging.log4j.core.appender.FileAppender
                .newBuilder()
            )
            builder.setName("npc-warning-capture")
            builder.withFileName(self._path)
            builder.setLayout(layout)
            appender = builder.build()
            appender.start()
            cfg.getRootLogger().addAppender(
                appender, jvm.org.apache.logging.log4j.Level.WARN, None
            )
            ctx.updateLoggers()
            self._appender = appender
        except Exception:
            # log4j2 API drift (shaded/renamed across Spark upgrades) must
            # not break the sweep itself; callers can see .active.
            self._appender = None

    @property
    def active(self) -> bool:
        return self._appender is not None

    def drain(self) -> str:
        """Return log text appended since the previous drain() call."""
        if not os.path.exists(self._path):
            return ""
        with open(self._path, errors="replace") as fh:
            fh.seek(self._offset)
            chunk = fh.read()
            self._offset = fh.tell()
        return chunk

    def dirty_lines(self) -> list[str]:
        """Drain and return the captured lines matching DIRTY_PATTERNS."""
        return [
            line
            for line in self.drain().splitlines()
            if any(p in line for p in DIRTY_PATTERNS)
        ]

    def close(self) -> None:
        if self._appender is not None:
            try:
                self._appender.stop()
            except Exception:
                pass
            self._appender = None
        try:
            os.unlink(self._path)
        except OSError:
            pass
