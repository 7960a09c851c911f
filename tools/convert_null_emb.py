"""Convert the null-prompt text embedding to weights/sd_null_emb.npy.

Two sources:
1. A torch blob like the reference's sd_null_emb.pt (a (1, 77, 1024) tensor
   saved with torch; base_model.py:24-27):
       python tools/convert_null_emb.py /path/to/sd_null_emb.pt ./weights
2. Recompute from the sd-turbo text encoder (needs transformers + weights):
       python tools/convert_null_emb.py --encode /path/to/sd-turbo ./weights
"""

import os
import sys

import numpy as np


def from_torch(path: str, dst: str):
    import torch
    emb = torch.load(path, map_location="cpu")
    arr = np.asarray(emb.detach().to(torch.float32).numpy())
    assert arr.ndim == 3 and arr.shape[0] == 1, arr.shape
    os.makedirs(dst, exist_ok=True)
    np.save(os.path.join(dst, "sd_null_emb.npy"), arr)
    print(f"wrote sd_null_emb.npy {arr.shape}")


def from_encoder(model_dir: str, dst: str):
    import torch
    from transformers import CLIPTextModel, CLIPTokenizer
    tok = CLIPTokenizer.from_pretrained(model_dir, subfolder="tokenizer")
    enc = CLIPTextModel.from_pretrained(model_dir, subfolder="text_encoder")
    ids = tok([""], padding="max_length", max_length=77,
              return_tensors="pt")
    with torch.no_grad():
        emb = enc(ids.input_ids)[0]
    os.makedirs(dst, exist_ok=True)
    np.save(os.path.join(dst, "sd_null_emb.npy"),
            emb.to(torch.float32).numpy())
    print(f"wrote sd_null_emb.npy {tuple(emb.shape)}")


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--encode":
        from_encoder(args[1], args[2] if len(args) > 2 else "./weights")
    else:
        from_torch(args[0], args[1] if len(args) > 1 else "./weights")
