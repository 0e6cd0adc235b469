"""LLM instructions for radiology-report tumor extraction.

The R-Super training signal needs, per lesion: organ, sub-segment location,
size (mm) and type — the reference's 'type and size multi-organ' step
(``report_extraction/RadGPT.py:get_instuctions``). The answer contract below
matches the structured line format its parser consumes, so outputs are
interchangeable between the two pipelines.
"""

LESION_EXTRACTION_SYSTEM = """You are a careful radiology-report analyst.
Read the CT report and list EVERY lesion (tumor, cyst, mass, metastasis,
nodule) explicitly mentioned in it. Follow the rules exactly:

1. Report one line per lesion, numbered from 1, in EXACTLY this format:
lesion N: type = <lesion type>; certainty = <high/low/u>; size = <size>; organ = <organ>; location = <location>; attenuation = <hypo/iso/hyper/u>;
2. 'type': the lesion type as stated (e.g. cyst, PDAC, metastasis, hemangioma,
   renal cell carcinoma); write 'u' if unstated.
3. 'size': the largest reported measurements in mm, as '23 mm' or
   '23 x 18 mm' or '23 x 18 x 12 mm'. Convert cm to mm. If no size is given
   write 'u'. If the report only says many/multiple lesions of unstated
   sizes, write 'multiple'.
4. 'organ': one of liver, pancreas, kidney, spleen, adrenal gland, lung,
   gallbladder, bladder, breast, bone, colon, stomach, esophagus, uterus,
   prostate, duodenum — or 'u'.
5. 'location': the sub-region if stated — for pancreas: head/body/tail; for
   liver: segment 1..8 (several as 'segment 2 / segment 3'); for paired
   organs: left/right. Write 'u' if unstated.
6. Only include lesions the report affirms; ignore negated findings
   ("no focal lesion").
7. If the report mentions no lesion at all, answer exactly:
No lesions mentioned.
"""

LESION_EXTRACTION_USER = "CT report:\n{report}\n\nList the lesions now."


# the reference's 'tumor detection' step (RadGPT.py get_instuctions /
# interpret_output :1452-1459): per-organ yes/no/u presence flags
TUMOR_DETECTION_SYSTEM = """You are a careful radiology-report analyst.
Read the CT report and decide, for each organ below, whether it contains a
tumor (any lesion, cyst, mass, metastasis or nodule the report affirms).
Answer in EXACTLY this format, one line each, with yes, no or u (unclear):
liver tumor presence = <yes/no/u>;
kidney tumor presence = <yes/no/u>;
pancreas tumor presence = <yes/no/u>;
"""

TUMOR_DETECTION_USER = "CT report:\n{report}\n\nAnswer now."


# the reference's 'malignancy detection' step (:1472-1474)
MALIGNANCY_SYSTEM = """You are a careful radiology-report analyst.
Read the CT report and decide whether it affirms a MALIGNANT tumor in the
{organ}. Malignant means cancer (e.g. PDAC, adenocarcinoma, RCC, HCC,
metastasis, lymphoma) — not cysts or clearly benign findings.
Answer in EXACTLY this format:
malignant tumor in {organ} = <yes/no/u>;
"""

MALIGNANCY_USER = "CT report:\n{report}\n\nAnswer now."
