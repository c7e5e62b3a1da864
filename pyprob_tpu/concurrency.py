"""Multi-process-safe persistent key/value shelf over sqlite3.

Counterpart of the reference's sqlitedict-based ``ConcurrentShelf``
(reference: pyprob/concurrency.py:9-96) and the zlib-pickle codec
(reference: pyprob/util.py:347-355), built directly on the stdlib
``sqlite3`` so there is no external dependency.  Writers retry with random
backoff on lock contention; ``lock()``/``unlock()`` wrap bulk writes in a
single immediate transaction.
"""

from __future__ import annotations

import os
import pickle
import random
import sqlite3
import time
import zlib


_zlib_level = -1  # util.set_compression (reference: util.py:128)


def encode(obj):
    return zlib.compress(
        pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), _zlib_level
    )


def decode(blob):
    return pickle.loads(zlib.decompress(blob))


class Shelf:
    """Dict-like persistent store: str key -> pickled+zlib value."""

    def __init__(self, file_name, timeout=60.0):
        self._file_name = file_name
        d = os.path.dirname(os.path.abspath(file_name))
        os.makedirs(d, exist_ok=True)
        self._conn = sqlite3.connect(file_name, timeout=timeout)
        self._in_transaction = False  # suppress per-write autocommit
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS shelf (key TEXT PRIMARY KEY, value BLOB)"
        )
        self._conn.commit()

    @property
    def file_name(self):
        return self._file_name

    def __getitem__(self, key):
        row = self._conn.execute(
            "SELECT value FROM shelf WHERE key = ?", (str(key),)
        ).fetchone()
        if row is None:
            raise KeyError(key)
        return decode(row[0])

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __setitem__(self, key, value):
        self._conn.execute(
            "INSERT OR REPLACE INTO shelf (key, value) VALUES (?, ?)",
            (str(key), encode(value)),
        )
        if not self._in_transaction:
            self._conn.commit()

    def __delitem__(self, key):
        self._conn.execute("DELETE FROM shelf WHERE key = ?", (str(key),))
        if not self._in_transaction:
            self._conn.commit()

    def __contains__(self, key):
        row = self._conn.execute(
            "SELECT 1 FROM shelf WHERE key = ?", (str(key),)
        ).fetchone()
        return row is not None

    def __len__(self):
        return self._conn.execute("SELECT COUNT(*) FROM shelf").fetchone()[0]

    def keys(self):
        return [r[0] for r in self._conn.execute("SELECT key FROM shelf")]

    def items(self):
        for k, v in self._conn.execute("SELECT key, value FROM shelf"):
            yield k, decode(v)

    def sync(self):
        self._conn.commit()

    def close(self):
        try:
            self._conn.commit()
            self._conn.close()
        except sqlite3.ProgrammingError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ConcurrentShelf:
    """Shelf wrapper that retries on sqlite lock errors with random backoff
    and supports an explicit lock()/unlock() for bulk writes
    (reference: pyprob/concurrency.py:21-36)."""

    def __init__(self, file_name, time_out_seconds=60.0):
        self._file_name = file_name
        self._time_out_seconds = time_out_seconds
        self._shelf = Shelf(file_name, timeout=time_out_seconds)
        self._locked = False

    @property
    def file_name(self):
        return self._file_name

    def _retry(self, fn, *args):
        start = time.time()
        while True:
            try:
                return fn(*args)
            except sqlite3.OperationalError as e:
                if "locked" not in str(e) and "busy" not in str(e):
                    raise
                if time.time() - start > self._time_out_seconds:
                    raise TimeoutError(
                        f"Shelf lock timeout after {self._time_out_seconds}s: {self._file_name}"
                    ) from e
                time.sleep(random.uniform(0.01, 0.2))

    def __getitem__(self, key):
        return self._retry(self._shelf.__getitem__, key)

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __setitem__(self, key, value):
        self._retry(self._shelf.__setitem__, key, value)

    def __contains__(self, key):
        return self._retry(self._shelf.__contains__, key)

    def __len__(self):
        return self._retry(self._shelf.__len__)

    def keys(self):
        return self._retry(self._shelf.keys)

    def lock(self, write=True):
        def _begin():
            self._shelf._conn.execute(
                "BEGIN IMMEDIATE" if write else "BEGIN"
            )

        self._retry(_begin)
        # suppress per-write autocommit so every write between lock() and
        # unlock() lands in ONE transaction (the bulk-write contract)
        self._shelf._in_transaction = True
        self._locked = True

    def unlock(self):
        if self._locked:
            self._shelf._in_transaction = False
            self._shelf._conn.commit()
            self._locked = False

    def sync(self):
        self._shelf.sync()

    def close(self):
        self.unlock()
        self._shelf.close()
