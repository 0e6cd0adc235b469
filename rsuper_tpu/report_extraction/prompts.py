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


# per-organ sub-location menus (reference ``organ_part`` table used by the
# 'type and size' / 'malignant size' instructions)
ORGAN_LOCATIONS = {
    "liver": "segment 1, segment 2, ..., segment 8 (Couinaud; several as "
             "'segment 2 / segment 3'), left lobe, right lobe",
    "pancreas": "head, body, tail, uncinate process",
    "kidney": "left, right, upper pole, lower pole",
}

# the reference's 'type and size' single-organ step
# (RadGPT.py instructions0ShotSizenType :490, interpret_output :1485-1498):
# one organ per call, one template line per tumor
TYPE_SIZE_ORGAN_SYSTEM = """You are a careful radiology-report analyst.
The CT report below may mention one or more tumors in the {organ}.
List the type, certainty of the type, size, and location of EVERY tumor in
the {organ}. Answer with one line per tumor, numbered from 1, in EXACTLY
this format:
{organ} tumor N: type = <lesion type>; certainty = <high/low/u>; size = <size>; location = <location>;

Rules:
1. 'size': the largest current measurements, as '23 mm' or '2.3 x 1.8 cm' —
   always state the unit (cm or mm); 'u' if unstated; 'multiple' if the
   report only says many lesions of unstated sizes. Ignore PAST measurements
   (phrases like previously, prior, compared to).
2. 'location': one of {organ_locations} — or 'u' if unstated.
3. Only include tumors the report affirms; ignore negated findings.
4. If the report mentions no tumor in the {organ}, answer exactly:
no tumor found.
"""

TYPE_SIZE_ORGAN_USER = "CT report:\n{report}\n\nList the tumors now."


# the reference's 'malignant size' step (RadGPT.py
# instructions0ShotMalignantSize :466, interpret_output :1475-1479)
MALIGNANT_SIZE_SYSTEM = """You are a careful radiology-report analyst.
The CT report below mentions a malignant tumor (or tumors) in the {organ}.
List the size and location of EVERY malignant tumor in the {organ} — not
benign findings (cysts, hemangiomas). Answer with one line per malignant
tumor, in EXACTLY this format:
{organ} malignant tumor size = <size>; location = <location>;

Rules:
1. 'size': current measurements as '23 mm' or '2.3 x 1.8 cm' — always write
   the unit (cm or mm; assume mm if the report omits it). Write 'U' if the
   report gives no size. Ignore PAST measurements.
2. 'location': one of {organ_locations} — or 'U' if unstated.
3. A tumor is malignant if the report calls it cancer/metastasis/growing
   oncologic lesion, names a malignant type, or the patient has known cancer
   in the {organ} and the tumor is not stated to be benign.
"""

MALIGNANT_SIZE_USER = "CT report:\n{report}\n\nList the malignant tumor sizes now."


# the reference's 'malignancy detection' step (:1472-1474)
MALIGNANCY_SYSTEM = """You are a careful radiology-report analyst.
Read the CT report and decide whether it affirms a MALIGNANT tumor in the
{organ}. Malignant means cancer (e.g. PDAC, adenocarcinoma, RCC, HCC,
metastasis, lymphoma) — not cysts or clearly benign findings.
Answer in EXACTLY this format:
malignant tumor in {organ} = <yes/no/u>;
"""

MALIGNANCY_USER = "CT report:\n{report}\n\nAnswer now."
