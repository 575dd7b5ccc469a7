"""Multi-host utilities: object gather + barrier.

The reference gathers generation metadata across processes with
torch.distributed all_gather_object (ref:perception/common/ddp_utils.py:5-16,
ref:val_set_gen.py:149-160). Here the same capability is
jax.distributed + process_allgather; this test runs a REAL 2-process
CPU (gloo) process group in subprocesses, exercising the pad/gather/
unpickle path with different payload sizes per rank.
"""
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_single_host_fast_paths():
    from magicdrive_tpu.parallel.multihost import all_gather_objects, barrier

    obj = {"a": [1, 2], "b": "x"}
    assert all_gather_objects(obj) == [obj]
    barrier("noop")  # must not touch devices on a single host


CHILD = textwrap.dedent("""
    import sys, os
    os.environ["JAX_PLATFORMS"] = "cpu"
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=nproc, process_id=pid)
    sys.path.insert(0, {repo!r})
    from magicdrive_tpu.parallel.multihost import all_gather_objects, barrier
    # different payload sizes per rank -> exercises the max-length padding
    obj = {{"rank": pid, "files": ["f%d_%d.png" % (pid, i)
                                   for i in range(pid + 1)]}}
    out = all_gather_objects(obj)
    barrier("test")
    assert len(out) == nproc, out
    for r in range(nproc):
        assert out[r]["rank"] == r
        assert len(out[r]["files"]) == r + 1
    print("OK", pid, flush=True)
""").format(repo=os.path.abspath(REPO))


def test_two_process_gather_and_barrier(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out
