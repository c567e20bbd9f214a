"""Tests for the text layer: PDF extraction, sentences, cleaning, chunking."""

import json

import pytest

from crs_tpu.rag.chunking import TextChunker
from crs_tpu.rag.document_processing import DocumentProcessor
from crs_tpu.utils.config import ConfigLoader
from crs_tpu.utils.pdftext import extract_pdf_pages
from crs_tpu.utils.sentences import split_sentences


# -- pdf --------------------------------------------------------------------

def test_pdf_pages(corpus_pdf):
    pages = extract_pdf_pages(str(corpus_pdf))
    assert len(pages) == 14
    assert "Model Compression" in pages[0]
    assert "Large Language Models" in pages[0]
    total = sum(len(p) for p in pages)
    assert total > 30_000


def test_pdf_known_content(corpus_pdf):
    text = "\n".join(extract_pdf_pages(str(corpus_pdf))).lower()
    for term in ["quantization", "pruning", "distillation", "llm"]:
        assert term in text


# -- sentences ---------------------------------------------------------------

def test_split_sentences_basic():
    s = split_sentences("Hello world. This is a test! Is it? Yes.")
    assert s == ["Hello world.", "This is a test!", "Is it?", "Yes."]


def test_split_sentences_abbreviations():
    s = split_sentences("Zhu et al. proposed GPTQ. It quantizes weights.")
    assert len(s) == 2
    assert s[0].startswith("Zhu et al. proposed")


def test_split_sentences_decimal():
    s = split_sentences("The model has 7.5 billion parameters. It is large.")
    assert len(s) == 2


def test_split_sentences_empty():
    assert split_sentences("") == []
    assert split_sentences("   \n ") == []


# -- cleaning ---------------------------------------------------------------

def test_clean_citations_and_urls():
    dp = DocumentProcessor({})
    text = "GPTQ [1] and AWQ [2, 3] are methods (Frantar et al., 2023). See https://x.com/a for info."
    cleaned = dp._clean_text(text)
    assert "[1]" not in cleaned
    assert "[2, 3]" not in cleaned
    assert "2023" not in cleaned
    assert "https" not in cleaned
    assert "GPTQ" in cleaned and "AWQ" in cleaned


def test_clean_ligatures_and_quotes():
    dp = DocumentProcessor({})
    assert dp._clean_text("eﬃcient “quote”") == 'efficient "quote"'


def test_clean_page_numbers():
    dp = DocumentProcessor({})
    cleaned = dp._clean_text("Some text\n12\nMore text\nPage 13\nEnd")
    assert "12" not in cleaned
    assert "Page 13" not in cleaned


def test_sections():
    dp = DocumentProcessor({})
    text = "Abstract\nsummary here\n2. Quantization\nquant text\n3.1 Weight-Only\ndetails"
    sections = dp.extract_sections(text)
    titles = [t for t, _ in sections]
    assert "Abstract" in titles
    assert "2. Quantization" in titles


def test_process_text_roundtrip(tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("Hello world. " * 50)
    dp = DocumentProcessor({})
    out = dp.process_file(str(p))
    assert len(out) == 1
    assert out[0][1] == 1


# -- chunking ---------------------------------------------------------------

def _words(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_fixed_chunking_windows():
    ch = TextChunker({"strategy": "fixed", "chunk_size": 100, "chunk_overlap": 20, "min_chunk_size": 1})
    chunks = ch.chunk(_words(250))
    sizes = [c.tokens for c in chunks]
    assert sizes[0] == 100
    # step = 80: windows at 0, 80, 160, 240
    assert chunks[1].text.split()[0] == "w80"
    assert sizes[-1] <= 100
    # full coverage
    assert "w249" in chunks[-1].text


def test_semantic_chunking_respects_paragraphs():
    paras = "\n\n".join(_words(60, f"p{i}_") for i in range(5))
    ch = TextChunker({"strategy": "semantic", "chunk_size": 150, "chunk_overlap": 10, "min_chunk_size": 1})
    chunks = ch.chunk(paras)
    assert all(c.tokens <= 160 for c in chunks)
    assert len(chunks) >= 2


def test_semantic_chunking_huge_paragraph():
    ch = TextChunker({"strategy": "semantic", "chunk_size": 100, "chunk_overlap": 10, "min_chunk_size": 1})
    chunks = ch.chunk(_words(350))
    assert all(c.tokens <= 100 for c in chunks)
    assert "w349" in chunks[-1].text


def test_sentence_chunking():
    text = " ".join(f"This is sentence number {i} with several words in it." for i in range(40))
    ch = TextChunker({"strategy": "sentence", "chunk_size": 80, "chunk_overlap": 10, "min_chunk_size": 1})
    chunks = ch.chunk(text)
    assert len(chunks) > 2
    for c in chunks:
        assert c.text.rstrip().endswith(".")


def test_chunk_ids_monotonic():
    ch = TextChunker({"strategy": "fixed", "chunk_size": 50, "chunk_overlap": 0, "min_chunk_size": 1})
    a = ch.chunk(_words(120), page_number=1)
    b = ch.chunk(_words(120), page_number=2)
    ids = [c.chunk_id for c in a + b]
    assert ids == [f"chunk_{i}" for i in range(len(ids))]
    assert a[0].page_number == 1 and b[0].page_number == 2


def test_chunk_metadata():
    ch = TextChunker({"strategy": "fixed", "chunk_size": 50, "chunk_overlap": 0, "min_chunk_size": 1})
    c = ch.chunk(_words(30), page_number=3, section="intro")[0]
    md = c.to_metadata()
    assert md["page_number"] == 3
    assert md["section"] == "intro"
    assert md["tokens"] == 30


def test_overlap_validation():
    with pytest.raises(ValueError):
        TextChunker({"chunk_size": 100, "chunk_overlap": 100})


# -- config -----------------------------------------------------------------

def test_config_defaults_and_dotted():
    cfg = ConfigLoader()
    assert cfg.get("rag.retrieval.top_k") == 3
    assert cfg.get("rag.chunking.strategy") == "semantic"
    cfg.update_config("rag.retrieval.top_k", 7)
    assert cfg.get("rag.retrieval.top_k") == 7
    assert cfg.get("nonexistent.path", 42) == 42


def test_config_load_merge(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"rag": {"retrieval": {"top_k": 9}}}))
    cfg = ConfigLoader(str(p))
    assert cfg.get("rag.retrieval.top_k") == 9
    # untouched defaults survive the merge
    assert cfg.get("rag.retrieval.similarity_threshold") == 0.3


def test_config_save(tmp_path):
    cfg = ConfigLoader()
    cfg.update_config("model.type", "int8")
    out = tmp_path / "saved.json"
    cfg.save_config(str(out))
    assert json.loads(out.read_text())["model"]["type"] == "int8"


def test_end_to_end_corpus_chunking(corpus_pdf):
    dp = DocumentProcessor({})
    pages = dp.process_pdf(str(corpus_pdf))
    assert len(pages) == 14
    ch = TextChunker({"strategy": "semantic", "chunk_size": 180, "chunk_overlap": 30, "min_chunk_size": 20})
    chunks = []
    for text, page in pages:
        chunks.extend(ch.chunk(text, page_number=page))
    assert len(chunks) > 20
    assert all(c.tokens > 0 for c in chunks)


def test_titlecase_section_spans():
    """Round 4: unnumbered Title-Case headers label spans without driving
    chunk boundaries (extract_sections stays conservative)."""
    from crs_tpu.rag.document_processing import DocumentProcessor

    dp = DocumentProcessor({})
    text = (
        "intro sentence about things.\n"
        "Post-Training Quantization\n"
        "body line one about ptq.\n"
        "body line two.\n"
        "Knowledge Distillation\n"
        "kd body line.\n"
    )
    spans = dp.section_spans(text, default_title="Methods")
    titles = [t for t, _, _ in spans]
    assert titles == ["Methods", "Post-Training Quantization", "Knowledge Distillation"]
    # spans tile the text in order and carry real content
    for t, s0, s1 in spans[1:]:
        assert text[s0:s1].strip()
    # extract_sections (boundary pass) must NOT split on title-case headers
    assert len(dp.extract_sections(text)) == 1


def test_titlecase_header_rejects_fragments():
    from crs_tpu.rag.document_processing import _match_titlecase_header

    assert _match_titlecase_header("Post-Training Quantization")
    assert _match_titlecase_header("Metrics and Benchmarks")
    assert not _match_titlecase_header("The model was trained")  # lowercase content words
    assert not _match_titlecase_header("results were good.")  # punctuation + lowercase
    assert not _match_titlecase_header("In this section we describe")  # starts with stopword
    assert not _match_titlecase_header("quantization methods")  # lowercase
    assert not _match_titlecase_header("A Very Long Heading That Goes On And On For Far Too Many Words")


def test_pipeline_chunks_carry_section_labels(corpus_pdf):
    """The bundled survey's unnumbered headings must label nearly every
    chunk (the round-3 gap: 39% of chunks had no section identity)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from crs_tpu.rag.pipeline import RAGPipeline

    p = RAGPipeline({
        "chunking": {"strategy": "semantic", "chunk_size": 90,
                     "chunk_overlap": 18, "min_chunk_size": 25},
        "embedding": {"backend": "hashed", "embedding_dim": 64},
        "vector_store": {"format": "fp32", "block_size": 128},
        "retrieval": {"top_k": 3, "similarity_threshold": 0.0},
    }).setup()
    p.index_documents(str(corpus_pdf))
    secs = [m.get("section", "") for m in p.store.metadatas]
    labeled = sum(1 for s in secs if s)
    assert labeled / len(secs) > 0.9, f"{labeled}/{len(secs)} labeled"
    assert any("Quantization" in s for s in secs)
