"""Engine factory / registry / band-engine output-shape tests."""

import pytest

from medical_and_charity_document_extraction_system_ray.engines import (
    BandOCREngine,
    EngineUnavailableError,
    available_engines,
    create_ocr_engine,
    map_language_codes,
    register_engine,
)
from medical_and_charity_document_extraction_system_ray.fixtures.media import (
    encode_text_image,
)


def test_factory_default_and_aliases():
    assert isinstance(create_ocr_engine(None), BandOCREngine)
    assert create_ocr_engine("paddleocr").engine_name == "paddle"
    with pytest.raises(ValueError, match="tesseract"):
        create_ocr_engine("tesseract")
    with pytest.raises(ValueError, match="unknown"):
        create_ocr_engine("nope")


def test_external_engines_unavailable_gracefully():
    eng = create_ocr_engine("easyocr")
    assert not eng.is_available()
    with pytest.raises(EngineUnavailableError):
        eng.initialize()


def test_register_custom_engine():
    class MyEngine(BandOCREngine):
        engine_name = "custom"

    register_engine("custom", MyEngine)
    assert "custom" in available_engines()
    assert isinstance(create_ocr_engine("custom"), MyEngine)


def test_language_map():
    assert map_language_codes("eng") == ["en"]
    assert map_language_codes("eng+hin") == ["en", "hi"]
    assert map_language_codes("zzz") == ["en"]


def test_band_engine_result_shape():
    # golden-output shape: every key path of the reference's result dict
    # (storage/json_tasks/task_1.json: text/confidence/word_count/
    #  character_count/words[].bbox/engine/language/metadata)
    eng = create_ocr_engine("band")
    text = "hello charity world"
    result = eng.process_image(encode_text_image(text))
    assert result["text"] == text
    assert result["word_count"] == 3
    assert result["character_count"] == len(text)
    assert 0.0 <= result["confidence"] <= 100.0
    assert result["engine"] == "BandOCREngine"
    assert result["language"] == "eng"
    assert "metadata" in result
    w = result["words"][0]
    assert w["text"] == "hello"
    assert set(w["bbox"]) == {"left", "top", "width", "height"}
    assert {"confidence", "block_num", "line_num", "word_num"} <= set(w)
