"""HF-transformers text encoders for HunyuanVideo (reference:
lightx2v/models/input_encoders/hf/llama/model.py, clip/model.py).

The Llama encoder extracts per-token hidden states (crop the system-prompt
template tokens); the CLIP text encoder returns the pooled output. These
run on CPU via torch (weights are HF checkpoints) and feed numpy arrays to
the TPU pipeline — they execute once per prompt, not in the hot loop.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

PROMPT_TEMPLATE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
)
PROMPT_CROP_START = 95


class TextEncoderHFLlamaModel:
    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModel.from_pretrained(model_path, torch_dtype=torch.float16).to(device).eval()
        self.device = device

    def infer(self, texts: List[str], config) -> Tuple[np.ndarray, np.ndarray]:
        import torch

        prompts = [PROMPT_TEMPLATE_VIDEO.format(t) for t in texts]
        enc = self.tokenizer(prompts, return_tensors="pt", padding="max_length",
                             truncation=True, max_length=PROMPT_CROP_START + 256)
        with torch.no_grad():
            out = self.model(input_ids=enc.input_ids.to(self.device),
                             attention_mask=enc.attention_mask.to(self.device),
                             output_hidden_states=True)
        hidden = out.hidden_states[-3][:, PROMPT_CROP_START:]
        mask = enc.attention_mask[:, PROMPT_CROP_START:]
        return hidden.float().cpu().numpy(), mask.cpu().numpy()


class TextEncoderHFClipModel:
    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        from transformers import CLIPTextModel, CLIPTokenizer

        self.tokenizer = CLIPTokenizer.from_pretrained(model_path)
        self.model = CLIPTextModel.from_pretrained(model_path, torch_dtype=torch.float16).to(device).eval()
        self.device = device

    def infer(self, texts: List[str], config) -> np.ndarray:
        import torch

        enc = self.tokenizer(texts, return_tensors="pt", padding="max_length",
                             truncation=True, max_length=77)
        with torch.no_grad():
            out = self.model(input_ids=enc.input_ids.to(self.device),
                             attention_mask=enc.attention_mask.to(self.device))
        return out.pooler_output.float().cpu().numpy()


class TextEncoderHFLlavaModel:
    """Llava (text+image) encoder for Hunyuan i2v (reference llava/model.py)."""

    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        from transformers import AutoProcessor, LlavaForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(model_path)
        self.model = LlavaForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float16).to(device).eval()
        self.device = device

    def infer(self, texts: List[str], image, config) -> Tuple[np.ndarray, np.ndarray]:
        import torch

        inputs = self.processor(text=texts, images=image, return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self.model(**inputs, output_hidden_states=True)
        hidden = out.hidden_states[-3]
        return hidden.float().cpu().numpy(), np.ones(hidden.shape[:2], np.int64)
