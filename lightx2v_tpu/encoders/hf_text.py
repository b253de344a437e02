"""HF-transformers text encoders for HunyuanVideo (reference:
lightx2v/models/input_encoders/hf/llama/model.py, clip/model.py,
llava/model.py).

The Llama encoder extracts per-token hidden states from layer -(skip+1)
and crops the system-prompt template tokens; the CLIP text encoder
returns the pooled output; the Llava encoder (Hunyuan i2v) splits the
hidden states into image rows (interleaved 1-in-4) and text rows around
the assistant tail. These run on CPU via torch (weights are HF
checkpoints) and feed numpy arrays to the TPU pipeline — they execute
once per prompt, not in the hot loop.

Constants (template, crop_start=95/103, skip_layer=2, max_length=351/359,
image_emb_len=576, interleave=4) mirror the reference's `init()` blocks
(llama/model.py:14-25, llava/model.py:67-87); they are constructor
arguments here so tiny-model tests can exercise the exact slicing code.
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
# reference llava/model.py:79-87 (i2v template carries <image> + assistant tail)
PROMPT_TEMPLATE_I2V = (
    "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the video by detailing the following aspects according to the reference image: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:<|eot_id|>\n\n"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n"
)
PROMPT_CROP_START = 95  # llama/model.py:16


class TextEncoderHFLlamaModel:
    """Reference llama/model.py:6-64: hidden_states[-(skip_layer+1)] with
    the template prefix cropped; max_length = crop_start + 256 = 351."""

    def __init__(self, model_path: str, device: str = "cpu",
                 crop_start: int = PROMPT_CROP_START,
                 hidden_state_skip_layer: int = 2,
                 prompt_template: str = PROMPT_TEMPLATE_VIDEO):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path, padding_side="right")
        self.model = AutoModel.from_pretrained(model_path, torch_dtype=torch.float16).to(device).eval()
        self.device = device
        self.crop_start = crop_start
        self.skip = hidden_state_skip_layer
        self.prompt_template = prompt_template
        self.max_length = crop_start + 256

    def infer(self, texts: List[str], config) -> Tuple[np.ndarray, np.ndarray]:
        import torch

        prompts = [self.prompt_template.format(t) for t in texts]
        enc = self.tokenizer(prompts, return_tensors="pt", padding="max_length",
                             truncation=True, max_length=self.max_length)
        with torch.no_grad():
            out = self.model(input_ids=enc.input_ids.to(self.device),
                             attention_mask=enc.attention_mask.to(self.device),
                             output_hidden_states=True)
        hidden = out.hidden_states[-(self.skip + 1)][:, self.crop_start:]
        mask = enc.attention_mask[:, self.crop_start:]
        return hidden.float().cpu().numpy(), mask.cpu().numpy()


class TextEncoderHFClipModel:
    """Reference clip/model.py:6-53: pooled output at max_length 77."""

    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        from transformers import AutoTokenizer, CLIPTextModel

        self.tokenizer = AutoTokenizer.from_pretrained(model_path, padding_side="right")
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
    """Llava (text+image) encoder for Hunyuan i2v — full reference
    semantics (llava/model.py:101-159):

    * hidden states from layer -(skip+1), where input rows are
      [prefix tokens][image_emb_len image rows][rest of text];
    * text rows = template-cropped text MINUS the 4-token assistant tail
      (located via the LAST double-newline token id), stitched across it;
    * image rows = the image_emb_len block, then interleave-subsampled
      1-in-4; final output = concat(image_rows, text_rows).

    The reference hardcodes the Llama-3 tokenizer's constants
    (crop_start=103, double_return_token_id=271, image_emb_len=576 =
    (336/14)^2); here image_emb_len defaults from the vision config and
    the rest are constructor args so tiny-model tests execute this exact
    arithmetic.
    """

    def __init__(self, model_path: str, device: str = "cpu",
                 crop_start: int = 103, double_return_token_id: int = 271,
                 image_emb_len: int | None = None,
                 hidden_state_skip_layer: int = 2,
                 image_embed_interleave: int = 4,
                 prompt_template: str = PROMPT_TEMPLATE_I2V,
                 max_length: int = 359, image_crop_start: int = 5):
        import torch
        from transformers import AutoProcessor, AutoTokenizer, LlavaForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(model_path)
        self.tokenizer = AutoTokenizer.from_pretrained(model_path, padding_side="right")
        self.model = LlavaForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float16).to(device).eval()
        self.device = device
        if image_emb_len is None:
            vc = self.model.config.vision_config
            image_emb_len = (vc.image_size // vc.patch_size) ** 2
        self.crop_start = crop_start
        self.double_return_token_id = double_return_token_id
        self.image_emb_len = image_emb_len
        self.skip = hidden_state_skip_layer
        self.interleave = image_embed_interleave
        self.prompt_template = prompt_template
        self.max_length = max_length
        # llava/model.py:74-76 (image_crop_start is 5 for the Llama-3
        # tokenizer: BOS + 4 header tokens precede <image>)
        self.text_crop_start = crop_start - 1 + image_emb_len
        self.image_crop_start = image_crop_start
        self.image_crop_end = image_crop_start + image_emb_len

    def infer(self, texts: List[str], image, config) -> Tuple[np.ndarray, np.ndarray]:
        import torch

        text = self.prompt_template.format(texts[0] if isinstance(texts, (list, tuple)) else texts)
        tokens = self.tokenizer(text, return_tensors="pt", padding="max_length",
                                truncation=True, max_length=self.max_length)
        # the reference runs legacy transformers where ONE <image> token in
        # input_ids explodes into image_emb_len hidden rows inside the
        # model; transformers>=4.47 requires the expansion in input_ids.
        # Expanding here keeps hidden rows == input rows, so the
        # reference's row arithmetic applies with every post-image index
        # shifted by (image_emb_len - 1).
        img_tok = self.model.config.image_token_index
        ids, mask = tokens["input_ids"][0], tokens["attention_mask"][0]
        pos = int(torch.where(ids == img_tok)[0][0])
        rep = torch.full((self.image_emb_len,), img_tok, dtype=ids.dtype)
        ids = torch.cat([ids[:pos], rep, ids[pos + 1:]])[None]
        mask = torch.cat([mask[:pos], torch.ones(self.image_emb_len, dtype=mask.dtype),
                          mask[pos + 1:]])[None]

        pixel_values = self.processor.image_processor(image, return_tensors="pt")["pixel_values"]
        with torch.no_grad():
            out = self.model(input_ids=ids.to(self.device),
                             attention_mask=mask.to(self.device),
                             pixel_values=pixel_values.to(self.model.dtype).to(self.device),
                             output_hidden_states=True)
        hidden = out.hidden_states[-(self.skip + 1)]

        # assistant-tail stitch (llava/model.py:126-136): the LAST
        # double-newline token marks "<|start_header_id|>assistant..."; the
        # 4 prompt rows before it are dropped from the text stream. In
        # expanded coordinates last_exp = last_unexpanded + image_emb_len-1,
        # so [a_start, a_end) = [last_exp - 4, last_exp) — identical rows
        # to the reference's crop_start-relative math.
        dbl = torch.where(ids[0] == self.double_return_token_id)[0]
        last = int(dbl[-1])
        text_hidden = torch.cat([hidden[0, self.text_crop_start:last - 4],
                                 hidden[0, last:]])
        text_mask = torch.cat([mask[0, self.text_crop_start:last - 4],
                               mask[0, last:]])
        image_hidden = hidden[0, self.image_crop_start:self.image_crop_end]
        image_mask = torch.ones(image_hidden.shape[0], dtype=mask.dtype)

        # 1-in-4 image-row interleave (llava/model.py:144-145)
        image_hidden = image_hidden[::self.interleave]
        image_mask = image_mask[::self.interleave]

        hidden_out = torch.cat([image_hidden, text_hidden])[None]
        mask_out = torch.cat([image_mask, text_mask])[None]
        return hidden_out.float().cpu().numpy(), mask_out.cpu().numpy()
