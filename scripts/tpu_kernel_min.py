"""Minimal real-TPU compile check for the group kernels."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
import tantivy_tpu as _tt; _tt.enable_compilation_cache()

from tantivy_tpu.ops import pallas_probe as pp

T = 2
tier = 64
tables = {
    "cl_weight": np.zeros((tier + 1, T), np.float32),
    "cl_kind": np.full((tier + 1, T), 3, np.int32),
    "cl_start": np.zeros((tier + 1, T), np.int32),
    "cl_len": np.zeros((tier + 1, T), np.int32),
    "cl_shipped": np.zeros((tier + 1, T), np.int32),
    "req_must": np.full(tier + 1, 1 << 30, np.int32),
    "req_should": np.zeros(tier + 1, np.int32),
}


class FakeFused:
    num_blocks = 128
    cstore = jnp.full((128, 384), 2147483647, dtype=jnp.uint32)


n = 16
work = (
    np.arange(n, dtype=np.int64) * 8 % 120,
    np.arange(n, dtype=np.int64) % tier,
    np.zeros(n, dtype=np.int64),
    np.full(n, 2, dtype=np.int64),
    np.arange(n, dtype=np.int64) % 4,
    np.zeros(n, dtype=np.int64),
    np.concatenate(
        [np.full((n, 1), -1, np.int64), np.zeros((n, 1), np.int64)], axis=1
    ),
    np.concatenate(
        [np.zeros((n, 1), np.int64), np.full((n, 1), 2, np.int64)], axis=1
    ),
    np.zeros((n, 2), np.int64),
    np.ones(n, dtype=bool),
)
t0 = time.time()
outs = pp.launch_fused_bool(FakeFused(), work, tables, 10, 4, False)
for o in outs:
    r = np.asarray(o)
print(f"bool group kernel compiled+ran in {time.time() - t0:.1f}s", flush=True)

from tantivy_tpu.ops import pallas_phrase as php


class FakeFused2(FakeFused):
    pos_rows = 256
    postore = jnp.full((256, 256), 0xFFFFFFFF, dtype=jnp.uint32)


S = 1
qw = np.zeros(tier + 1, dtype=np.float32)
workp = (
    np.arange(n, dtype=np.int64) * 8 % 120,
    np.arange(n, dtype=np.int64) % tier,
    np.arange(n, dtype=np.int64) % 4,
    np.zeros(n, dtype=np.int64),
    np.zeros(n, dtype=np.int64),
    np.full(n, 100, dtype=np.int64),
    np.zeros((n, S), dtype=np.int64),
    np.full((n, S), 100, dtype=np.int64),
    np.ones((n, S), dtype=np.int64),
    np.zeros(n, dtype=np.int64),
)
t0 = time.time()
outs = php.launch_fused_phrase(FakeFused2(), workp, qw, S, 10, 4, False)
for o in outs:
    r = np.asarray(o)
print(f"phrase group kernel compiled+ran in {time.time() - t0:.1f}s",
      flush=True)
print("OK")
