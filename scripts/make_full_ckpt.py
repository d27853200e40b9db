import sys, torch
sys.path.insert(0, 'tests')
import torch_ref
from matrix_eyes_tpu.config import DEPTH_PRO
m = torch_ref.DepthPro(DEPTH_PRO)
# scale down init for stability; keep it cheap (no per-param rand loop)
sd = m.state_dict()
torch.manual_seed(0)
for k, v in sd.items():
    if v.ndim >= 2:
        fan_in = v.shape[1] if v.ndim == 2 else v[0].numel()
        v.normal_(0, 1.0 / max(fan_in, 1) ** 0.5)
    else:
        v.uniform_(0.05, 0.3)
sd16 = {k: v.half() for k, v in sd.items()}
torch.save(sd16, '/tmp/ckpt_full/depth_pro.pt')
print('saved')
