"""Minimal KV-store contract + in-memory implementation.

The reference's online tier reads/writes Avro-encoded IRs through a
pluggable KVStore (online/.../KVStore.scala; GroupByUpload writes batch
IRs, the Flink job writes tiles, the Fetcher reads both). This is the
same seam sized for this engine: datasets are named tables of
(key bytes -> value bytes); the batch upload and the tile sink write
sketch/scalar IR bytes; the fetcher merges them at query time.

InMemoryKv is the sandbox implementation (a dict per dataset) — swapping
in a real store is a constructor change, the byte contracts stay."""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from typing import Iterable, Optional


class KvStore(ABC):
    @abstractmethod
    def put(self, dataset: str, key: bytes, value: bytes) -> None: ...

    @abstractmethod
    def get(self, dataset: str, key: bytes) -> Optional[bytes]: ...

    @abstractmethod
    def scan(self, dataset: str, key_prefix: bytes = b"") -> Iterable[tuple[bytes, bytes]]: ...


class InMemoryKv(KvStore):
    def __init__(self):
        self.data: dict[str, dict[bytes, bytes]] = {}

    def put(self, dataset: str, key: bytes, value: bytes) -> None:
        self.data.setdefault(dataset, {})[key] = value

    def get(self, dataset: str, key: bytes) -> Optional[bytes]:
        return self.data.get(dataset, {}).get(key)

    def scan(self, dataset: str, key_prefix: bytes = b"") -> Iterable[tuple[bytes, bytes]]:
        for k, v in self.data.get(dataset, {}).items():
            if k.startswith(key_prefix):
                yield k, v


def key_bytes(key_values: tuple) -> bytes:
    """Canonical key encoding: JSON of the key tuple (stable, readable;
    the reference uses Avro — byte layout is a serde detail behind the
    seam)."""
    return json.dumps(list(key_values), sort_keys=False).encode()
