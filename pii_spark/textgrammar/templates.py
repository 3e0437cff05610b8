"""Template inventory for positive examples.

Mirrors the category structure and slot patterns of the reference's
TEMPLATES list (pii_synth/generation.py:393-517): contact lines, form /
application records, CSV rows, reddit/forum style, email/message,
social, support, medical, legal, shipping, registration, chaotic mixes,
and short fragments — including templates with repeated {person}/{age}
slots and newline-separated forms. Wording is our own; the *shape*
(which fields appear in which lexical contexts) is the reproduced
semantic.
"""

TEMPLATES = (
    # contact lines
    "Contact {person} at {email} or {phone}.",
    "{person} from {org} used card {credit_card} on {date}.",
    "SSN: {ssn}; Phone: {phone}; Email: {email}.",
    "Ship to {address} for {person} from {org} by {date}.",
    "Billing card {credit_card} was charged on {date}.",
    "You can reach {person} ({org}) via {email}.",
    "Meeting on {date}. Call {phone} if late.",
    "Invoice to {org}, attention {person}, address {address}.",
    "My brother is {age} years old",
    "Applicant: {person}, DOB: {date}, SSN: {ssn}, Contact: {phone}",
    "Username: {person}, Email: {email}, Age: {age}, Phone: {phone}",
    "Attendees: {person}, {person}, {person} - Call-in: {phone}",
    "Name: {person} | DOB: {date} | Email: {email} | SSN: {ssn}",
    "Full Name: {person}, Address: {address}, Email: {email}, Social Number: {ssn}",
    # reddit / forum style
    "yo anyone know how to contact {person}? their email is {email}",
    "just got scammed by {org}, card ending in {credit_card}",
    "DM me at {email} if interested",
    "{person} is legit, bought from them yesterday",
    "don't share ur ssn like {ssn} online smh",
    "hmu at {email} or call {phone}",
    "does anyone have {person}'s contact info? maybe {email}?",
    "shipping to {address}, hope it arrives by {date}",
    "{org} charged my card {credit_card} without permission wtf",
    "my phone is {phone} if u need to reach me",
    "contact info: {person}, {email}, {phone}",
    "I {age} just broke up with my partner and need advice",
    "My boyfriend {age} won't talk to me about our problems",
    "Me {age} and my girlfriend {age} can't agree on anything",
    "My partner {age} is leaving me {age} for another woman",
    "deleted my old account but you can reach me at {email} or {phone}",
    "throwaway but {person} totally screwed me, email {email} if u want details",
    "PSA don't trust {org}, they have my card {credit_card} and won't refund",
    "anyone else get scammed by {person}? dm me at {email}",
    "TIFU by giving {org} my ssn {ssn} over the phone",
    "yo {person} hit me up, lost ur number, mine is {phone}",
    "bruh i think {org} leaked my info ({email}, {phone}, even address {address})",
    "my ex {person} won't stop calling from {phone} wtf do i do",
    # application / form style (incl. newline-separated)
    "Applicant: {person}\nDOB: {date}\nSSN: {ssn}\nContact: {phone}\nEmail: {email}",
    "Full Name: {person}\nAddress: {address}\nPhone: {phone}\nSocial: {ssn}",
    "ID: {person}, Born: {date}, Age: {age}, Contact: {email}/{phone}",
    "Name: {person} | Email: {email} | SSN: {ssn} | Card: {credit_card}",
    "Username: {person}\nEmail: {email}\nPhone: {phone}\nRegistered: {date}",
    "Patient: {person}, DOB {date}, Phone {phone}, Address {address}",
    "Employee #{person}, Hired {date}, SSN {ssn}, Dept: {org}",
    "Account holder: {person}, Card ending {credit_card}, Exp {date}",
    # meeting / conference
    "Meeting on {date} - Attendees: {person}, {person}, {person}",
    "Call scheduled for today, dial {phone} for access",
    "Attendees: {person} ({email}), {person} ({phone})",
    "Zoom link sent to {email}, meeting on {date}",
    "Please confirm attendance for {date} - reply to {email}",
    # data dump / CSV style
    "{person},{date},{email},{phone},{ssn}",
    "{person} | {age} | {address} | {phone}",
    "Name: {person}, Email: {email}, Phone: {phone}, Card: {credit_card}",
    "{person};{date};{ssn};{org};{phone}",
    # email / message style
    "Hi {person}, Your order will ship to {address} by {date}. Questions? Call {phone}",
    "From: {person}\nTo: {email}\nSubject: Meeting {date}\nCall me: {phone}",
    "Thanks {person}! Your card {credit_card} was charged on {date}",
    # social media
    "happy birthday {person}! call me later {phone}",
    "{person} tagged you in a post from {date}",
    "following {person} now, hmu at {email}",
    # customer support
    "Ticket #{person} - Customer: {person}, Email: {email}, Issue date: {date}",
    "Reference #{person}, Contact {phone}, Card ending {credit_card}",
    "Support request from {person} at {address}, callback: {phone}",
    # medical
    "Patient {person}, DOB {date}, Age {age}, Contact {phone}",
    "Visit scheduled on {date}, Patient: {person}, SSN: {ssn}",
    "Prescription for {person}, filled {date}, Phone: {phone}",
    # legal
    "Party A: {person}, SSN {ssn}, Address {address}, Date {date}",
    "Signed by {person} on {date}, Contact: {email}",
    "Witness: {person}, Phone: {phone}, Date: {date}",
    # shipping
    "Ship to {person} at {address}, Contact {phone}, Expected {date}",
    "Delivery for {person}, Address: {address}, Phone: {phone}",
    "Package arriving {date} at {address}, Call {phone} if issues",
    # registration
    "Welcome {person}! Your account email is {email}, registered {date}",
    "User {person} created {date}, Contact: {email}/{phone}",
    "Profile: {person}, Age {age}, Email {email}, Joined {date}",
    # chaotic mixes
    "ok so {person} said to email {email} or call {phone} but idk if its legit",
    "my info: {person}, born {date}, email me at {email} not {phone}",
    "DON'T SHARE but here's {person}'s contact: {email} / {phone} / ssn {ssn}",
    "invoice to {org} attn {person} card {credit_card} address {address}",
    "{person} ({age}) applied on {date}, contact via {email} or {phone}",
    # short / incomplete edge cases
    "{person} {email}",
    "{phone} call me",
    "email: {email} phone: {phone}",
    "{person} - {date}",
    "{ssn} {person}",
)
