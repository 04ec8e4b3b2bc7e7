"""Generate the instruction task-template library (data/tasks/*.json).

Produces the same task-id set as the reference library (SURVEY.md:
procyon/data/instruct_tune/tasks, 66 files) in the same JSON schema
(Definition template with summary slots, CATEGORY, example id lists) with
this framework's own template wording. For byte-exact parity with released
ProCyon checkpoints, point TaskLibrary at the original task directory
instead.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "procyon_tpu", "data",
                   "tasks")

QA_DEF = ("You will be shown text describing {Biological Summary} along "
          "with a protein. Your job is to determine if the shown protein "
          "is {Relationship Summary} that the text describes. "
          "{Task-Specific Relationship}You may only output yes or no. If "
          "the protein shown is the one described, you should respond yes. "
          "Otherwise, you should respond no.")
RET_DEF = ("You will be shown text describing {Biological Summary}. Your "
           "job is to retrieve a protein that is {Relationship Summary} "
           "that the text describes. {Task-Specific Relationship}")
CAP_DEF = ("You will be shown a protein. Your job is to write text "
           "describing {Biological Summary} for which the shown protein "
           "is {Relationship Summary}. {Task-Specific Relationship}")

QA_PPI_DEF = ("You will be shown a pair of proteins. Your job is to "
              "determine whether the two proteins {Relationship Summary}. "
              "{Task-Specific Relationship}You may only output yes or no.")
RET_PPI_DEF = ("You will be shown a protein. Your job is to retrieve a "
               "second protein such that the two proteins "
               "{Relationship Summary}. {Task-Specific Relationship}")

# dataset -> (biological summary, relationship summary, task-specific note)
DATASETS = {
    "go_process": (
        "a biological process accomplished by multiple molecular "
        "activities where proteins are involved",
        "involved in the process",
        "Involvement is determined by direct experimental evidence "
        "supporting the annotation of the protein. "),
    "go_component": (
        "a cellular component, meaning a location relative to cellular "
        "structures in which a protein performs its function",
        "located in the component",
        "Localization is determined by direct experimental evidence "
        "supporting the annotation of the protein. "),
    "go_function": (
        "a molecular function, meaning an activity that can be performed "
        "by a protein at the molecular level",
        "able to perform the function",
        "Function assignment is determined by direct experimental "
        "evidence supporting the annotation of the protein. "),
    "go_all": (
        "a Gene Ontology term covering a biological process, molecular "
        "function, or cellular component associated with proteins",
        "annotated with the term",
        ""),
    "pfam_all": (
        "a protein family, meaning a group of evolutionarily related "
        "proteins sharing sequence and structural features",
        "a member of the family",
        ""),
    "drugbank_drug_target": (
        "a drug, meaning a chemical compound used in the diagnosis, "
        "treatment, or prevention of disease",
        "a target of the drug",
        "A target is a protein to which the drug directly binds to exert "
        "its therapeutic effect. "),
    "drugbank_drug_carrier": (
        "a drug, meaning a chemical compound used in the diagnosis, "
        "treatment, or prevention of disease",
        "a carrier of the drug",
        "A carrier is a protein that binds and transports the drug "
        "through the body without being its therapeutic target. "),
    "drugbank_drug_enzyme": (
        "a drug, meaning a chemical compound used in the diagnosis, "
        "treatment, or prevention of disease",
        "an enzyme acting on the drug",
        "An enzyme here is a protein that chemically modifies the drug, "
        "for example during its metabolism. "),
    "drugbank_drug_transporter": (
        "a drug, meaning a chemical compound used in the diagnosis, "
        "treatment, or prevention of disease",
        "a transporter of the drug",
        "A transporter is a protein that moves the drug across cellular "
        "membranes. "),
    "reactome_all": (
        "a biological pathway, meaning an ordered series of molecular "
        "events leading to a cellular change or product",
        "a participant in the pathway",
        ""),
    "ec_all": (
        "an enzymatic activity described by the Enzyme Commission "
        "classification of biochemical reactions",
        "able to catalyze the reaction",
        ""),
    "gtop_all": (
        "a pharmacological target class from the Guide to Pharmacology "
        "describing receptors, channels, and enzymes",
        "a member of the target class",
        ""),
    "omim_all": (
        "a Mendelian disease phenotype, meaning a heritable condition "
        "with a characterized genetic basis",
        "associated with the disease",
        "Association means variation in the gene encoding the protein "
        "is causally implicated in the disease. "),
    "disgenet_all": (
        "a disease phenotype curated from the scientific literature",
        "associated with the disease",
        "Association is supported by curated gene-disease evidence. "),
    "uniprot_all": (
        "the functional annotation of a protein as curated in UniProt",
        "the protein whose function",
        ""),
    "peptide_all": (
        "a protein receptor involved in peptide binding",
        "a peptide that binds the receptor",
        "Binding means a direct physical interaction between the peptide "
        "and the receptor. "),
}

DOMAIN_DATASETS = {
    "domain_go_process": DATASETS["go_process"],
    "domain_go_component": DATASETS["go_component"],
    "domain_go_function": DATASETS["go_function"],
    "domain_pfam_all": DATASETS["pfam_all"],
}

PPI_DATASETS = {
    "protein_coexpression": (
        "", "are co-expressed across tissues and conditions",
        "Co-expression is derived from correlated transcript abundance. "),
    "protein_experiments": (
        "", "physically interact as determined by experiments",
        "Interactions are supported by direct experimental evidence such "
        "as affinity purification or yeast two-hybrid assays. "),
    "protein_homology": (
        "", "are homologous, meaning they share common ancestry",
        "Homology is inferred from sequence similarity. "),
}

# Task-definition rephrasings (it_collator.py:392-418 semantics: per-task
# paraphrase variants at expertise/rephrase levels, sampled at collate
# time). Fresh wording; slot structure identical to the canonical form.
REPHRASINGS = {
    "qa": [
        ("rephrasing", "mid",
         "The following text concerns {Biological Summary}. Decide whether "
         "the accompanying protein is {Relationship Summary} described "
         "there. {Task-Specific Relationship}Answer strictly with yes or "
         "no: yes if the protein matches the description, no otherwise."),
        ("rephrasing", "senior",
         "Given a textual characterization of {Biological Summary} and a "
         "candidate protein, assess whether that protein is "
         "{Relationship Summary} referenced in the text. "
         "{Task-Specific Relationship}Respond only with yes or no."),
        ("summarisation", "junior",
         "Text about {Biological Summary} is shown with a protein. Say yes "
         "if the protein is {Relationship Summary} in the text, otherwise "
         "say no. {Task-Specific Relationship}"),
        ("simplification", "junior",
         "Read the text about {Biological Summary}. Look at the protein. "
         "Is the protein {Relationship Summary} the text talks about? "
         "{Task-Specific Relationship}Reply yes or no only."),
    ],
    "retrieval": [
        ("rephrasing", "mid",
         "The following text concerns {Biological Summary}. Find a protein "
         "that is {Relationship Summary} described there. "
         "{Task-Specific Relationship}"),
        ("rephrasing", "senior",
         "Given a textual characterization of {Biological Summary}, "
         "identify a protein that is {Relationship Summary} referenced in "
         "the text. {Task-Specific Relationship}"),
        ("summarisation", "junior",
         "Text about {Biological Summary} is shown. Pick a protein that is "
         "{Relationship Summary} in the text. "
         "{Task-Specific Relationship}"),
        ("simplification", "junior",
         "Read the text about {Biological Summary}. Find the protein that "
         "is {Relationship Summary} the text talks about. "
         "{Task-Specific Relationship}"),
    ],
    "caption": [
        ("rephrasing", "mid",
         "A protein is shown below. Compose text describing "
         "{Biological Summary} for which this protein is "
         "{Relationship Summary}. {Task-Specific Relationship}"),
        ("rephrasing", "senior",
         "Given the protein presented, author a description of "
         "{Biological Summary} such that the protein is "
         "{Relationship Summary}. {Task-Specific Relationship}"),
        ("summarisation", "junior",
         "A protein is shown. Write text on {Biological Summary} where the "
         "protein is {Relationship Summary}. "
         "{Task-Specific Relationship}"),
        ("simplification", "junior",
         "Look at the protein. Write what {Biological Summary} it goes "
         "with, where the protein is {Relationship Summary}. "
         "{Task-Specific Relationship}"),
    ],
}
REPHRASINGS_PPI = {
    "qa": [
        ("rephrasing", "mid",
         "Two proteins are shown below. Decide whether they "
         "{Relationship Summary}. {Task-Specific Relationship}Answer "
         "strictly with yes or no."),
        ("rephrasing", "senior",
         "Given the pair of proteins presented, assess whether the two "
         "{Relationship Summary}. {Task-Specific Relationship}Respond "
         "only with yes or no."),
        ("summarisation", "junior",
         "A protein pair is shown. Say yes if they "
         "{Relationship Summary}, otherwise say no. "
         "{Task-Specific Relationship}"),
        ("simplification", "junior",
         "Look at the two proteins. Do they {Relationship Summary}? "
         "{Task-Specific Relationship}Reply yes or no only."),
    ],
    "retrieval": [
        ("rephrasing", "mid",
         "A protein is shown below. Find a second protein so that the two "
         "{Relationship Summary}. {Task-Specific Relationship}"),
        ("rephrasing", "senior",
         "Given the protein presented, identify a partner protein such "
         "that the pair {Relationship Summary}. "
         "{Task-Specific Relationship}"),
        ("summarisation", "junior",
         "One protein is shown. Pick another so the two "
         "{Relationship Summary}. {Task-Specific Relationship}"),
        ("simplification", "junior",
         "Look at the protein. Find one more protein so that they "
         "{Relationship Summary}. {Task-Specific Relationship}"),
    ],
}


EXAMPLES_POS = [{"text": 0, "aaseq": 0, "output": "yes"},
                {"text": 1, "aaseq": 1, "output": "yes"}]
EXAMPLES_NEG = [{"text": 2, "aaseq": 2, "output": "no"},
                {"text": 3, "aaseq": 3, "output": "no"}]
EXAMPLES_PPI_POS = [{"aaseq_1": 0, "aaseq_2": 1, "output": "yes"},
                    {"aaseq_1": 2, "aaseq_2": 3, "output": "yes"}]
EXAMPLES_PPI_NEG = [{"aaseq_1": 4, "aaseq_2": 5, "output": "no"},
                    {"aaseq_1": 6, "aaseq_2": 7, "output": "no"}]


def task_json(name, summaries, category, ppi=False):
    bio, rel, spec = summaries
    dataset_id = name.split("_")[0]
    if ppi:
        definition = QA_PPI_DEF if category == "qa" else RET_PPI_DEF
        pos, neg = EXAMPLES_PPI_POS, EXAMPLES_PPI_NEG
        rephrasings = REPHRASINGS_PPI[category]
    else:
        definition = {"qa": QA_DEF, "retrieval": RET_DEF,
                      "caption": CAP_DEF}[category]
        pos, neg = EXAMPLES_POS, EXAMPLES_NEG
        rephrasings = REPHRASINGS[category]
    return {
        "Definition": definition,
        "Rephrasings": [
            {"Definition": d, "level": lvl, "expertise": exp}
            for lvl, exp, d in rephrasings],
        "DATASET_IDENTIFIER": dataset_id,
        "CATEGORY": category,
        "Relationship Summary": rel,
        "Biological Summary": bio,
        "Task-Specific Relationship": spec,
        "Positive Examples": pos,
        "Negative Examples": neg if category == "qa" else [],
        "Instances": None,
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    count = 0
    for name, summaries in {**DATASETS, **DOMAIN_DATASETS}.items():
        cats = ["qa", "retrieval", "caption"]
        if name == "peptide_all":
            cats = ["qa", "retrieval"]
        for cat in cats:
            path = os.path.join(OUT, f"{name}_{cat}.json")
            with open(path, "w") as f:
                json.dump(task_json(name, summaries, cat), f, indent=2)
            count += 1
    for name, summaries in PPI_DATASETS.items():
        for cat in ["qa", "retrieval"]:
            path = os.path.join(OUT, f"{name}_{cat}.json")
            with open(path, "w") as f:
                json.dump(task_json(name, summaries, cat, ppi=True), f,
                          indent=2)
            count += 1
    print(f"wrote {count} task templates to {OUT}")


if __name__ == "__main__":
    main()
