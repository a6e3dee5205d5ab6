"""Worker process for the 2-process jax.distributed test (test_distributed.py).

Run as:  python tests/dist_worker.py <process_id> <port>

Joins a 2-process CPU process group (4 virtual devices per process — the
multi-host layout of SURVEY.md §4.4 without a cluster), then drives the
whole parallel/distributed.py surface: initialize -> make_render_mesh ->
globally-sharded render -> host_gather_image, plus the hybrid (host, chip)
mesh with a cross-DCN psum.  Prints DIST_OK on success; any assertion
kills the worker and fails the parent test.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    pid, port = int(sys.argv[1]), sys.argv[2]

    import euclider_tpu as et
    from euclider_tpu.parallel import distributed as D
    from euclider_tpu.parallel.mesh import render_image_sharded

    is_dist = D.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert is_dist, "initialize() must report multi-host"
    idx, cnt = D.process_info()
    assert (idx, cnt) == (pid, 2), (idx, cnt)
    assert len(jax.devices()) == 8, jax.devices()
    assert jax.local_device_count() == 4

    # --- 1D render mesh: host-major rows ---------------------------------
    mesh = D.make_render_mesh()
    procs = [d.process_index for d in mesh.devices.ravel()]
    assert procs == sorted(procs), f"render mesh not host-major: {procs}"

    sc = et.get_scene("config1_sphere_room")
    static, tables = et.compile_scene(sc)
    cam = et.compile_camera(sc.camera)
    H, W = 16, 64

    tables_g = D.replicate_to_global(tables, mesh)
    cam_g = D.replicate_to_global(cam, mesh)
    img = render_image_sharded(static, tables_g, cam_g, H, W, mesh)
    full = D.host_gather_image(img)
    assert full.shape == (H, W, 3), full.shape

    ref = np.asarray(et.render_image_jit(static, tables, cam, H, W))
    err = np.abs(full - ref).max()
    assert err < 1e-5, f"gathered frame differs from single-process: {err}"

    # --- hybrid (host, chip) mesh: ICI-only rows, one psum across DCN ----
    hybrid = D.make_hybrid_mesh()
    assert hybrid.devices.shape == (2, 4), hybrid.devices.shape
    for h in range(2):
        rows = {d.process_index for d in hybrid.devices[h]}
        assert len(rows) == 1, f"row {h} mixes processes: {rows}"

    from functools import partial

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    x = jax.make_array_from_process_local_data(
        NamedSharding(hybrid, P("host", "chip")),
        np.full((1, 4), float(pid + 1), np.float32))

    def local_sum(a):
        return jax.lax.psum(jax.lax.psum(a, "chip"), "host")

    y = shard_map(local_sum, mesh=hybrid, in_specs=(P("host", "chip"),),
                  out_specs=P(None, None), check_vma=False)(x)
    total = float(np.asarray(jax.device_get(
        jax.jit(lambda v: v, out_shardings=NamedSharding(hybrid, P()))(y)
    )).ravel()[0])
    # sum over 8 devices: 4x1.0 (host 0) + 4x2.0 (host 1) = 12
    assert total == 12.0, total

    print(f"DIST_OK process={pid} err={err:.2e} psum={total}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
