"""Executed coverage for the HF text-encoder wrappers (encoders/hf_text.py)
with tiny randomly-initialized HF models — VERDICT r3 missing #4.

Pins against the reference's semantics:
* Llama (reference llama/model.py:14-61): hidden_states[-(skip+1)] with
  skip=2, template-prefix crop of hidden AND mask, max_length = crop+256.
* CLIP text (clip/model.py:14-47): pooled output at max_length 77.
* Llava (llava/model.py:67-159): image rows [start, start+emb_len) taken
  from layer -(skip+1), interleave-subsampled 1-in-4; text rows stitched
  across the 4-token assistant tail located at the LAST double-newline
  token; output = concat(image, text) for states and mask.

The tiny models run the REAL transformers code path (config-built, saved
to disk, loaded via from_pretrained like production); a final test drives
the hunyuan runner end-to-end with the tiny encoders feeding a synthetic
DiT + VAE.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lightx2v_tpu.encoders.hf_text import (  # noqa: E402
    PROMPT_TEMPLATE_I2V,
    PROMPT_TEMPLATE_VIDEO,
    TextEncoderHFClipModel,
    TextEncoderHFLlamaModel,
    TextEncoderHFLlavaModel,
)

TOKEN_RE = r"<\|[a-z_]+\|>|<image>|\n\n|\n| |[A-Za-z0-9'{}]+|[^\sA-Za-z0-9]"
SAMPLE_TEXTS = ["a red panda climbing a tree", "two cats on the grass , realistic"]


def _build_tokenizer(tmpdir: str):
    """Tiny offline WordLevel fast tokenizer covering the Hunyuan prompt
    templates; '\\n\\n' is its own token (the Llava double-return marker,
    reference llava/model.py:71 double_return_token_id)."""
    from tokenizers import Regex, Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    text = (PROMPT_TEMPLATE_VIDEO + PROMPT_TEMPLATE_I2V + " ".join(SAMPLE_TEXTS))
    words = sorted(set(re.findall(TOKEN_RE, text)))
    vocab = {"[PAD]": 0, "[UNK]": 1}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Split(Regex(TOKEN_RE), behavior="isolated")
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, pad_token="[PAD]",
                                   unk_token="[UNK]")
    fast.save_pretrained(tmpdir)
    return fast, vocab


@pytest.fixture(scope="module")
def tiny_dirs(tmp_path_factory):
    """Save tiny llama / clip-text / llava checkpoints + tokenizer."""
    from transformers import (CLIPImageProcessor, CLIPTextConfig, CLIPTextModel,
                              CLIPVisionConfig, LlamaConfig, LlamaModel,
                              LlavaConfig, LlavaForConditionalGeneration,
                              LlavaProcessor)

    root = tmp_path_factory.mktemp("tiny_hf")
    tok_dir = str(root / "tok")
    os.makedirs(tok_dir, exist_ok=True)
    fast, vocab = _build_tokenizer(tok_dir)
    torch.manual_seed(0)

    llama_cfg = LlamaConfig(vocab_size=len(vocab) + 4, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=4,
                            num_attention_heads=4, num_key_value_heads=4,
                            max_position_embeddings=2048)
    llama_dir = str(root / "text_encoder")
    LlamaModel(llama_cfg).save_pretrained(llama_dir)
    fast.save_pretrained(llama_dir)

    clip_cfg = CLIPTextConfig(vocab_size=len(vocab) + 4, hidden_size=16,
                              intermediate_size=32, num_hidden_layers=2,
                              num_attention_heads=2, max_position_embeddings=77)
    clip_dir = str(root / "text_encoder_2")
    CLIPTextModel(clip_cfg).save_pretrained(clip_dir)
    fast.save_pretrained(clip_dir)

    vis_cfg = CLIPVisionConfig(hidden_size=24, intermediate_size=48,
                               num_hidden_layers=2, num_attention_heads=2,
                               image_size=32, patch_size=8, num_channels=3)
    llava_cfg = LlavaConfig(vision_config=vis_cfg, text_config=llama_cfg,
                            image_token_index=vocab["<image>"],
                            projector_hidden_act="gelu")
    llava_dir = str(root / "llava")
    LlavaForConditionalGeneration(llava_cfg).save_pretrained(llava_dir)
    fast.save_pretrained(llava_dir)
    ip = CLIPImageProcessor(size={"shortest_edge": 32},
                            crop_size={"height": 32, "width": 32})
    LlavaProcessor(image_processor=ip, tokenizer=fast).save_pretrained(llava_dir)

    return {"root": str(root), "llama": llama_dir, "clip": clip_dir,
            "llava": llava_dir, "vocab": vocab, "tokenizer": fast}


class _Cfg(dict):
    def __getattr__(self, k):
        return self[k]


def test_llama_hidden_state_extraction(tiny_dirs):
    """hidden_states[-3] + crop semantics vs direct model call
    (reference llama/model.py:54-61)."""
    crop = 7
    enc = TextEncoderHFLlamaModel(tiny_dirs["llama"], "cpu", crop_start=crop)
    assert enc.max_length == crop + 256  # llama/model.py:14 (95 + 256 = 351)
    hidden, mask = enc.infer([SAMPLE_TEXTS[0]], _Cfg())
    assert hidden.shape == (1, 256, 32)
    assert mask.shape == (1, 256)

    # independent transcription of the reference math
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tiny_dirs["llama"], padding_side="right")
    model = AutoModel.from_pretrained(tiny_dirs["llama"],
                                      torch_dtype=torch.float16).eval()
    prompts = [PROMPT_TEMPLATE_VIDEO.format(SAMPLE_TEXTS[0])]
    t = tok(prompts, return_tensors="pt", padding="max_length", truncation=True,
            max_length=crop + 256)
    with torch.no_grad():
        out = model(input_ids=t.input_ids, attention_mask=t.attention_mask,
                    output_hidden_states=True)
    want = out.hidden_states[-3][:, crop:].float().numpy()
    np.testing.assert_allclose(hidden, want, rtol=0, atol=0)
    np.testing.assert_array_equal(mask, t.attention_mask[:, crop:].numpy())
    # the crop removes exactly the template prefix rows: un-cropped mask
    # must have at least `crop` leading ones (template tokens are real)
    assert t.attention_mask[0, :crop].sum() == crop


def test_llama_skip_layer_is_not_last(tiny_dirs):
    """-(skip+1) with skip=2 must differ from the final hidden state —
    catches an off-by-one in the index (llama/model.py:15,59)."""
    enc = TextEncoderHFLlamaModel(tiny_dirs["llama"], "cpu", crop_start=7)
    t = enc.tokenizer([PROMPT_TEMPLATE_VIDEO.format("hi")], return_tensors="pt",
                      padding="max_length", truncation=True, max_length=enc.max_length)
    with torch.no_grad():
        out = enc.model(input_ids=t.input_ids, attention_mask=t.attention_mask,
                        output_hidden_states=True)
    assert len(out.hidden_states) == 5  # 4 layers + embeddings
    assert not torch.equal(out.hidden_states[-3], out.hidden_states[-1])


def test_clip_pooled(tiny_dirs):
    enc = TextEncoderHFClipModel(tiny_dirs["clip"], "cpu")
    pooled = enc.infer(SAMPLE_TEXTS, _Cfg())
    assert pooled.shape == (2, 16)

    from transformers import AutoTokenizer, CLIPTextModel

    tok = AutoTokenizer.from_pretrained(tiny_dirs["clip"], padding_side="right")
    model = CLIPTextModel.from_pretrained(tiny_dirs["clip"],
                                          torch_dtype=torch.float16).eval()
    t = tok(SAMPLE_TEXTS, return_tensors="pt", padding="max_length",
            truncation=True, max_length=77)
    with torch.no_grad():
        want = model(input_ids=t.input_ids,
                     attention_mask=t.attention_mask).pooler_output
    np.testing.assert_allclose(pooled, want.float().numpy(), rtol=0, atol=0)


def test_llava_image_text_split(tiny_dirs):
    """Full Llava row arithmetic (llava/model.py:121-151): image rows,
    interleave, assistant-tail stitch, mask layout."""
    vocab = tiny_dirs["vocab"]
    dbl_id = vocab["\n\n"]
    image = np.random.default_rng(0).integers(0, 255, (48, 48, 3), np.uint8)

    # the tiny tokenizer puts <image> at row 4 (no BOS); the reference's
    # Llama-3 tokenizer puts it at 5 (llava/model.py:75) — constructor arg
    tok = tiny_dirs["tokenizer"]
    probe = tok(PROMPT_TEMPLATE_I2V.format("x"))["input_ids"]
    img_pos = probe.index(vocab["<image>"])

    enc = TextEncoderHFLlavaModel(
        tiny_dirs["llava"], "cpu", crop_start=9, double_return_token_id=dbl_id,
        hidden_state_skip_layer=2, image_embed_interleave=4, max_length=120,
        image_crop_start=img_pos)
    # emb_len derived from the vision config: (32/8)^2 = 16
    assert enc.image_emb_len == 16
    hidden, mask = enc.infer([SAMPLE_TEXTS[0]], image, _Cfg())
    assert hidden.shape[0] == 1 and mask.shape[0] == 1
    assert hidden.shape[1] == mask.shape[1]

    # expected = independent transcription on the same expanded sequence
    text = PROMPT_TEMPLATE_I2V.format(SAMPLE_TEXTS[0])
    t = tok(text, return_tensors="pt", padding="max_length", truncation=True,
            max_length=120)
    ids0, mask0 = t["input_ids"][0], t["attention_mask"][0]
    img_tok = vocab["<image>"]
    pos = int(torch.where(ids0 == img_tok)[0][0])
    emb = 16
    ids = torch.cat([ids0[:pos], torch.full((emb,), img_tok, dtype=ids0.dtype),
                     ids0[pos + 1:]])[None]
    m = torch.cat([mask0[:pos], torch.ones(emb, dtype=mask0.dtype),
                   mask0[pos + 1:]])[None]
    pix = enc.processor.image_processor(image, return_tensors="pt")["pixel_values"]
    with torch.no_grad():
        out = enc.model(input_ids=ids, attention_mask=m,
                        pixel_values=pix.to(enc.model.dtype),
                        output_hidden_states=True)
    h = out.hidden_states[-3]
    last = int(torch.where(ids[0] == dbl_id)[0][-1])
    text_start = 9 - 1 + emb
    want_text = torch.cat([h[0, text_start:last - 4], h[0, last:]])
    want_img = h[0, pos:pos + emb][::4]
    want = torch.cat([want_img, want_text])[None].float().numpy()
    np.testing.assert_allclose(hidden, want, rtol=0, atol=0)

    # image portion of the mask is all ones, exactly ceil(16/4) rows
    n_img = len(range(0, emb, 4))
    assert (mask[0, :n_img] == 1).all()
    want_mask = torch.cat([m[0, text_start:last - 4], m[0, last:]]).numpy()
    np.testing.assert_array_equal(mask[0, n_img:], want_mask)
    # image rows sit where the expanded ids have image tokens
    assert pos == enc.image_crop_start


def test_hunyuan_runner_e2e_with_tiny_encoders(tiny_dirs, tmp_path):
    """End-to-end hunyuan runner smoke: REAL tiny HF encoders (llama hidden
    32 = synthetic arch text_states_dim, clip pooled 16 = dim_2) feed the
    synthetic DiT + VAE; pipeline writes a playable video file."""
    import lightx2v_tpu.runners  # noqa: F401  (registers runners)
    from lightx2v_tpu.utils.config import ConfigDict
    from lightx2v_tpu.utils.registry import RUNNER_REGISTER

    out = str(tmp_path / "hy.mp4")
    cfg = ConfigDict(
        model_cls="hunyuan", task="t2v", synthetic_weights=True,
        text_encoder_path=tiny_dirs["root"], text_encoder_crop_start=7,
        prompt=SAMPLE_TEXTS[0], negative_prompt="", seed=3,
        infer_steps=2, target_video_length=5, target_height=32,
        target_width=32, text_len=32, save_video_path=out,
        attention_impl="xla", fps=8,
    )
    runner = RUNNER_REGISTER["hunyuan"](cfg)
    # the real encoder path produced full-length (crop+256) states sized
    # for the synthetic arch (text_states_dim=32, dim_2=16)
    enc_out = runner.run_input_encoder()
    states = enc_out["text_encoder_output"]["text_encoder_1_text_states"]
    pooled = enc_out["text_encoder_output"]["text_encoder_2_text_states"]
    assert states.shape == (1, 256, 32)
    assert pooled.shape == (1, 16)
    runner.run_pipeline()
    assert os.path.exists(out) and os.path.getsize(out) > 0
