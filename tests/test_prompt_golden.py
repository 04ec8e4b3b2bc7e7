"""Golden prompt-format regression tests.

The reference pins transformers==4.31.0 because exact prompt/token streams
define generation behavior (README.md:61). Our equivalent anchor: the
assembled instruction strings must not drift across refactors.
"""
from procyon_tpu.data import instruct


GOLDEN_QA = """Definition: {d}
Positive example 1:
Description: [EXT]
Protein: <|protein|>
[CONTEXT]Output: [ANSWER] yes
Negative example 1:
Description: [EXT]
Protein: <|protein|>
[CONTEXT]Output: [ANSWER] no
Now, complete the following instance:
Description: [EXT]
Protein: <|protein|>
[CONTEXT]Output: [ANSWER] {answer}"""

GOLDEN_RETRIEVAL = """Definition: {d}
Positive example 1:
[CONTEXT]Description: [EXT]
Protein: <|protein|>
Now, complete the following instance:
[CONTEXT]Description: [EXT]
Protein: [PROT]"""

GOLDEN_CAPTION = """Definition: {d}
Positive example 1:
[CONTEXT]Protein: <|protein|>
Output: [ANSWER] [EXT]
Now, complete the following instance:
[CONTEXT]Protein: <|protein|>
Output: [ANSWER] [EXT]"""

GOLDEN_PPI_QA = """Definition: {d}
Positive example 1:
Protein 1: <|protein|>
Protein 2: <|protein|>
Output: [ANSWER] yes
Negative example 1:
Protein 1: <|protein|>
Protein 2: <|protein|>
Output: [ANSWER] no
Now, complete the following instance:
Protein 1: <|protein|>
Protein 2: <|protein|>
Output: [ANSWER] {answer}"""


def _check(task_id, golden, **kw):
    lib = instruct.TaskLibrary()
    task = lib.get(task_id)
    p = instruct.get_prompt(task, num_examples=1, **kw)
    want = golden.format(d=instruct.fill_definition(task),
                         answer="{answer}")
    assert p.text == want, f"prompt drift for {task_id}:\n{p.text!r}"


def test_qa_prompt_golden():
    _check("go_process_qa", GOLDEN_QA)


def test_retrieval_prompt_golden():
    _check("omim_all_retrieval", GOLDEN_RETRIEVAL)


def test_caption_prompt_golden():
    _check("uniprot_all_caption", GOLDEN_CAPTION)


def test_ppi_qa_prompt_golden():
    _check("protein_experiments_qa", GOLDEN_PPI_QA, is_ppi=True)


def test_domain_prompt_uses_domain_word():
    lib = instruct.TaskLibrary()
    p = instruct.get_prompt(lib.get("domain_pfam_all_qa"), num_examples=1,
                            aaseq_type="domain")
    assert "Domain: <|protein|>" in p.text
