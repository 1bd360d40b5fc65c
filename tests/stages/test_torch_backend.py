"""Registry + gating tests for the import-gated torch BioNER backend.

The container has no torch, so the real forward pass cannot run here;
what these tests pin is the seam the reference checkpoint drops into:
the registry name, the config plumb-through, the STUB error contract
(mirrors the fasttext gate in stages/encode.py), and — when torch IS
available — the architecture module names matching the reference
state-dict keys (bioner_model.py:16-34), so a published ``.pt``
loads without key remapping.
"""

import pytest

from bioner_ray.stages.scorer import BioNERTorchModel, load_model

try:
    import torch  # noqa: F401

    HAVE_TORCH = True
except ImportError:
    HAVE_TORCH = False


class TestTorchGate:
    @pytest.mark.skipif(HAVE_TORCH, reason="torch installed: gate inactive")
    def test_registry_raises_stub_without_torch(self):
        with pytest.raises(NotImplementedError, match="STUB"):
            load_model("bioner-bilstm")

    @pytest.mark.skipif(HAVE_TORCH, reason="torch installed: gate inactive")
    def test_config_reaches_constructor(self):
        # the gate fires FIRST, before any config validation — a caller
        # with torch gets exactly these kwargs (checkpoint, sizes)
        with pytest.raises(NotImplementedError, match="bioner-bilstm"):
            load_model(
                "bioner-bilstm",
                checkpoint_path="/nonexistent/model.pt",
                input_vector_size=300,
                lstm_layer_size=1024,
            )

    def test_unknown_model_still_raises_value_error(self):
        with pytest.raises(ValueError, match="unknown model"):
            load_model("bioner-bilstm-v2")

    def test_inference_batch_matches_reference(self):
        # annotator.py:272-273 — 128 sentences per inference batch
        assert BioNERTorchModel.INFERENCE_SENTENCE_BATCH == 128


@pytest.mark.skipif(not HAVE_TORCH, reason="torch not installed")
class TestTorchForward:
    def test_state_dict_keys_match_reference(self):
        m = BioNERTorchModel(input_vector_size=8, feedforward_layer_size=16, lstm_layer_size=4)
        keys = set(m.module.state_dict().keys())
        # reference module attribute names (bioner_model.py:23-33)
        assert any(k.startswith("ff1.") for k in keys)
        assert any(k.startswith("biLSTM.") for k in keys)
        assert any(k.startswith("additional_biLSTM_layers.0.") for k in keys)
        assert any(k.startswith("additional_biLSTM_layers.1.") for k in keys)
        assert any(k.startswith("encoderLSTM.") for k in keys)
        assert any(k.startswith("hidden2tag.") for k in keys)

    def test_predict_shapes_and_truncation(self):
        m = BioNERTorchModel(input_vector_size=8, feedforward_layer_size=16, lstm_layer_size=4)
        out = m.predict_documents_tokens([[["a", "b", "c"], []], [["d"]]])
        assert [len(t) for doc in out for t in doc] == [3, 0, 1]
        assert all(int(v) in (0, 1, 2) for doc in out for t in doc for v in t)
