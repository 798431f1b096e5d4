"""Device-mesh sharding of the window-batch alignment step.

The reference scales across GPUs with independent per-device batches fed by a
work queue (src/cuda/cudapolisher.cpp:166-181) and across nodes with SGE job
scripts (scripts/vechat_hpc.fast.sh). The TPU-native equivalent: a
`jax.sharding.Mesh` over the chips with the window-batch axis sharded
data-parallel; XLA partitions the DP and traceback with zero communication
(windows are independent), and cross-chip stats ride `psum`-style reductions
at the end.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WINDOW_AXIS = "windows"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (WINDOW_AXIS,))


def shard_batch_specs(mesh: Mesh):
    """NamedShardings for the poa_align_batch_device argument list: batch axis
    sharded across the mesh, everything else replicated within a shard."""
    s = lambda *axes: NamedSharding(mesh, P(*axes))
    batched = s(WINDOW_AXIS)
    return dict(
        codes=batched,
        preds=batched,
        node_id=batched,
        is_sink=batched,
        n_nodes=batched,
        seq=batched,
        seq_len=batched,
    )


def sharded_poa_align(mesh: Mesh, align_type: str, m: int, x: int, g: int):
    """Returns a jitted, mesh-sharded version of the batched POA aligner.
    The batch dimension must be divisible by the mesh size."""
    from ..ops.kernels.poa_jax import poa_align_batch_device

    batched = NamedSharding(mesh, P(WINDOW_AXIS))

    def fn(codes, preds, node_id, is_sink, n_nodes, seq, seq_len):
        return poa_align_batch_device(
            codes,
            preds,
            node_id,
            is_sink,
            n_nodes,
            seq,
            seq_len,
            align_type=align_type,
            m=m,
            x=x,
            g=g,
        )

    return jax.jit(
        fn,
        in_shardings=(batched,) * 7,
        out_shardings=(batched, batched, batched),
    )


def sharded_poa_align_pallas(
    mesh: Mesh,
    align_type: str,
    m: int,
    x: int,
    g: int,
    interpret: bool = False,
    dp_only: bool = False,
    ring: int = 0,
    emit_node_ids: bool = True,
):
    """Mesh-sharded Pallas correction kernel: `shard_map` over the window
    axis runs one per-device kernel instance per shard (Pallas kernels do
    not auto-partition under jit the way plain XLA ops do). Windows are
    independent, so there is no cross-shard communication in the DP itself;
    this is the TPU analog of the reference's per-GPU cudapoa batches
    (src/cuda/cudapolisher.cpp:166-181). Batch must divide by mesh size."""
    from ..ops.kernels.poa_pallas import _poa_align_pallas_impl

    spec = P(WINDOW_AXIS)

    def fn(codes, preds, sink, node_id, n_nodes, seqp, seq_len):
        return _poa_align_pallas_impl(
            codes,
            preds,
            sink,
            node_id,
            n_nodes,
            seqp,
            seq_len,
            align_type=align_type,
            m=m,
            x=x,
            g=g,
            interpret=interpret,
            dp_only=dp_only,
            ring=ring,
            emit_node_ids=emit_node_ids,
        )

    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(spec,) * 7,
            out_specs=(spec, spec, spec, spec),
            # pallas_call's out_shape has no vma annotation; the kernel is
            # per-shard independent so the varying-mesh-axes check adds nothing
            check_vma=False,
        )
    )
