"""Common JAX runtime setup: persistent compilation cache (the remote-compile
tunnel costs minutes per module; the cache makes reruns instant) and the
multi-host bootstrap (the jax.distributed analogue of the reference's
torch.distributed.run launch, /root/reference/src/train.py:141-159)."""

import os

_DISTRIBUTED_DONE = False


def _env_int(name):
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def maybe_init_distributed():
    """Form the global multi-host runtime (one process per host).

    The reference bootstraps DDP from torchrun env vars
    (src/train.py:141-159: RANK/WORLD_SIZE -> init_process_group over NCCL).
    Here the trigger is either ``C2M_MULTIHOST=1`` (on TPU pods
    ``jax.distributed.initialize()`` autodetects coordinator/rank/size from
    the metadata server, so the flag alone suffices) or an explicit
    ``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``]
    triple for generic clusters. After this, ``jax.devices()`` is the global
    device list, ``jax.process_index()/process_count()`` drive the loader's
    disjoint host shard (data/loader.py), and ``parallel.mesh.make_mesh``
    spans the pod — no other code changes between 1 and N hosts.

    Guarded: a no-op when not triggered, when already initialized (by us or
    by the embedding application), or on repeat calls. A triggered-but-failed
    initialize RAISES — training on a half-formed mesh must not happen.

    Returns True iff the distributed runtime is (now) initialized.
    """
    global _DISTRIBUTED_DONE
    if _DISTRIBUTED_DONE:
        return True
    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS")
    want = os.environ.get("C2M_MULTIHOST", "").lower() in ("1", "true", "yes")
    if not (want or explicit):
        return False
    import jax
    try:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=_env_int("JAX_NUM_PROCESSES"),
            process_id=_env_int("JAX_PROCESS_ID"))
    except RuntimeError as e:
        if "already" in str(e).lower():  # initialized by the host app
            _DISTRIBUTED_DONE = True
            return True
        raise
    _DISTRIBUTED_DONE = True
    return True


def setup_jax(platform=None, cache_dir=None):
    import jax
    maybe_init_distributed()
    if platform:
        jax.config.update("jax_platforms", platform)
    cache = cache_dir or os.environ.get("C2M_JAX_CACHE",
                                        os.path.expanduser("~/.cache/c2m_jax"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
