"""On-the-fly optical flow for training (``use_pre_processed_of: False``).

Reference: Trainer.compute_flow (src/trainer/trainer.py:42-98) — per batch,
FlowNet2 computes forward flow between consecutive input frames (conditioning
stream) and forward+backward flow between the last input frame and every
predicted frame (supervision targets); occlusion = the confidence splat from
the FlowNet wrapper. Frames are scaled to [-1, 1] before FlowNet (the
reference does ``video * 2 - 1``).

One jitted call computes all 2*(T-1) flows by batching the frame pairs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from c2m_tpu.models.flownet2 import FlowNet2, compute_flow_and_conf


class OnTheFlyFlow:
    def __init__(self, num_input_frames: int, num_predicted_frames: int,
                 weights_path: Optional[str] = None):
        self.t_in = num_input_frames
        self.t_out = num_predicted_frames
        self.model = FlowNet2()
        self.variables = None
        self.weights_path = weights_path
        self._compute = None

    def _init(self, sample_frame: jnp.ndarray):
        import numpy as np
        probe = jnp.zeros((1, *sample_frame.shape[2:4], 3))
        self.variables = self.model.init(jax.random.PRNGKey(0), probe, probe)
        if self.weights_path:
            data = np.load(self.weights_path, allow_pickle=True)
            self.variables = {"params": data["params"].item()}
        apply_fn = self.model.apply
        t_in, t_out = self.t_in, self.t_out

        @jax.jit
        def compute(variables, video):
            # video [B, T, H, W, 3] in [0, 1]
            v = video * 2.0 - 1.0
            src = v[:, t_in - 1]
            # pair up (a, b) for every required flow in one batched call
            a_list, b_list = [], []
            for i in range(t_in - 1):                 # input stream fw flows
                a_list.append(v[:, i])
                b_list.append(v[:, i + 1])
            for i in range(t_out):                    # fw then bw per target
                a_list.append(src)
                b_list.append(v[:, t_in + i])
            for i in range(t_out):
                a_list.append(v[:, t_in + i])
                b_list.append(src)
            a = jnp.concatenate(a_list, axis=0)
            b = jnp.concatenate(b_list, axis=0)
            flow, conf = compute_flow_and_conf(apply_fn, variables, a, b)
            bsz = video.shape[0]

            def grab(start, count):
                f = flow[start * bsz:(start + count) * bsz]
                c = conf[start * bsz:(start + count) * bsz]
                f = f.reshape(count, bsz, *f.shape[1:]).transpose(1, 0, 2, 3, 4)
                c = c.reshape(count, bsz, *c.shape[1:]).transpose(1, 0, 2, 3, 4)
                return f, c

            out: Dict[str, jnp.ndarray] = {}
            if t_in > 1:
                in_of, in_occ = grab(0, t_in - 1)
                out["input_of"], out["input_occ"] = in_of, in_occ
            fw_of, fw_occ_src = grab(t_in - 1, t_out)
            bw_of, bw_occ_src = grab(t_in - 1 + t_out, t_out)
            # naming per the reference: the confidence returned with the
            # forward flow supervises the *backward* occlusion and vice versa
            # (trainer.py:63-87: fw_flow pairs with bw_conf)
            out["target_bw_of"] = bw_of
            out["target_bw_occ"] = fw_occ_src
            out["target_fw_of"] = fw_of
            out["target_fw_occ"] = bw_occ_src
            return out

        self._compute = compute

    def __call__(self, video: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self._compute is None:
            self._init(video)
        return self._compute(self.variables, video)
